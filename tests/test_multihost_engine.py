"""Multi-host serving execution: the full scheduler loop in lockstep.

Parity target: the reference's multi-node mode — rank 0 pops the task queue
then ``engine_->broadcast_data(new_tasks)`` and every rank runs the identical
``batch_search`` loop (src/generator/batch_generator.cpp:1477-1480,
host_communicator.hpp:17-110).

Two tiers, both with REAL processes:

1. Lockstep protocol only: two processes with independent single-device CPU
   meshes, connected by the TCP control plane. Rank 0 serves real requests
   (incl. sessions + close events); the worker must replay the scheduler
   bit-identically.
2. Full multi-host engine: two processes rendezvous via
   ``jax.distributed.initialize`` (2 virtual CPU devices each), shard the
   model TP=4 over the global mesh, and drive DynamicBatchGenerator
   end-to-end through the real scheduler. Outputs must match on both hosts.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
mode, rank, ctrl_port, coord_port, out_path = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
if mode == "mesh":
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["ZT_CONTROL_ADDR"] = f"127.0.0.1:{ctrl_port}"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from zhilight_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, ParallelConfig, SchedulerConfig,
)
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.engine.session import SessionGenerator
from zhilight_tpu.engine.task import SearchTask
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L

VOCAB, EOS = 64, 1

# record every finished task on any rank
finished = {}
_orig_finish = SearchTask.finish
def _patched(self):
    finished[self.task_id] = list(self.output_tokens)
    _orig_finish(self)
SearchTask.finish = _patched
_orig_multi = SearchTask.finish_multi
def _patched_multi(self, outs):
    finished[self.task_id] = [list(o.token_ids) for o in outs]
    _orig_multi(self, outs)
SearchTask.finish_multi = _patched_multi

if mode == "mesh":
    from zhilight_tpu.parallel.mesh import ensure_distributed
    from zhilight_tpu.config import ParallelConfig as _PC

    ensure_distributed(_PC(num_hosts=2, host_rank=rank,
                           coordinator_address=f"127.0.0.1:{coord_port}"))

cfg = ModelConfig(
    model_type="llama", num_layers=2, dim_model=32, num_heads=4, dim_head=8,
    num_kv_heads=2, dim_ff=64, vocab_size=VOCAB, dtype="float32",
)
params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
tp, dp = (2, 2) if mode == "mesh" else (1, 1)  # kv_heads=2 bounds tp
ecfg = EngineConfig(
    max_model_len=64,
    cache=CacheConfig(page_size=4, num_pages=64),
    scheduler=SchedulerConfig(
        max_batch=4, max_total_token=512, chunk_size=8,
        prefill_buckets=(8, 16, 32), eos_id=EOS, decode_multi_step=2,
    ),
    parallel=ParallelConfig(
        tp=tp, dp=dp, num_hosts=2, host_rank=rank,
        coordinator_address=f"127.0.0.1:{coord_port}" if mode == "mesh" else None,
    ),
)
llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
if mode == "mesh":
    assert jax.process_count() == 2
    assert llm.executor.mesh.devices.size == 4

gen = DynamicBatchGenerator(llm).start()
if rank == 0:
    rng = np.random.RandomState(5)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 11, 19)]
    results = gen.batch_generate(prompts, GeneratorArg(max_length=8))
    sampled = gen.generate(
        prompts[0], GeneratorArg(max_length=6, temperature=0.8, top_p=0.9, seed=7)
    )
    with SessionGenerator(gen) as sess:
        sess.generate(list(rng.randint(2, VOCAB, size=6)), GeneratorArg(max_length=3))
        sess.generate(list(rng.randint(2, VOCAB, size=4)), GeneratorArg(max_length=3))
    assert not gen.scheduler.sessions, "close_session must apply in-loop"
    gen.stop()  # broadcasts the shutdown sentinel to the worker
else:
    # worker: the scheduler thread replays rank 0's loop; wait for shutdown
    gen.scheduler._thread.join(timeout=280)
    assert not gen.scheduler._thread.is_alive(), "worker loop did not stop"
    assert not gen.scheduler.sessions, "session close event not replayed"

json.dump({str(k): v for k, v in sorted(finished.items())}, open(out_path, "w"))
print(f"rank {rank} DONE n={len(finished)}", flush=True)
"""


def _run_pair(mode: str, tmp_path):
    ctrl, coord = _free_port(), _free_port()
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX", "XLA"))}
    env["PYTHONPATH"] = REPO
    outs = [str(tmp_path / f"rank{r}.json") for r in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, mode, str(r), str(ctrl), str(coord), outs[r]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
            cwd=REPO,
        )
        for r in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        logs.append(out)
    for r, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {r} failed:\n{log[-4000:]}"
    r0 = json.load(open(outs[0]))
    r1 = json.load(open(outs[1]))
    # every rank-0 request must have been replayed on the worker with
    # bit-identical output tokens (same computation, same seeds)
    assert r0 and r0 == r1, f"rank0={r0}\nrank1={r1}"


def test_lockstep_control_plane(tmp_path):
    """Tier 1: protocol/replay identity across independent meshes."""
    _run_pair("plane", tmp_path)


def test_multihost_mesh_engine(tmp_path):
    """Tier 2: end-to-end engine on a 2-process global TP=4 mesh."""
    _run_pair("mesh", tmp_path)
