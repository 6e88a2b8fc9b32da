"""Expert-parallel communication audit (VERDICT r1 #6).

The MoE layer shards stacked expert weights ``P(tp, None, None)`` and runs
``jax.lax.ragged_dot`` under plain jit (models/moe.py). This test pins the
property that makes that safe at DeepSeek scale: XLA's SPMD partitioner must
NOT all-gather the expert stacks around the grouped GEMM — per-layer
communication has to scale with tokens, not with expert bytes (reference
MOE_EXP_PARALLEL ships tokens, feedforward.cpp:251-267).

Empirically XLA partitions ragged_dot over the sharded group dim and emits
only O(num_experts) int32 collectives for the group-size metadata plus
token-sized data movement; if a regression (or jax upgrade) changes that,
this test fails and the layer must move to explicit shard_map + all-to-all.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zhilight_tpu.config.model_config import ModelConfig, MoEConfig
from zhilight_tpu.models.moe import init_moe_params, moe_layer


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("tp",))


def test_no_expert_weight_allgather():
    mesh = _mesh()
    E, D, F, T = 16, 256, 512, 64
    cfg = ModelConfig(
        model_type="llama", num_layers=1, dim_model=D, num_heads=4, dim_head=64,
        num_kv_heads=4, dim_ff=F, vocab_size=1000, dtype="float32",
        moe=MoEConfig(num_experts=E, top_k=2, intermediate_size=F),
    )
    p = init_moe_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    espec = NamedSharding(mesh, P("tp", None, None))
    p["experts"] = {
        k: {"w": jax.device_put(v["w"], espec)} for k, v in p["experts"].items()
    }
    p["router"]["w"] = jax.device_put(p["router"]["w"], NamedSharding(mesh, P()))
    rng = np.random.RandomState(0)
    x = jax.device_put(
        jnp.asarray(rng.randn(T, D).astype(np.float32)),
        NamedSharding(mesh, P()),
    )

    with jax.set_mesh(mesh):
        fn = jax.jit(lambda p, x: moe_layer(p, cfg, x))
        hlo = fn.lower(p, x).compile().as_text()
        got = np.asarray(jax.device_get(fn(p, x)))

    # every all-gather / all-to-all must be token- or metadata-sized; an
    # expert-weight gather would be >= E/shards * D * F elements per shard
    big = []
    for m in re.finditer(r"(all-gather|all-to-all)[^=]*= (\w+)\[([\d,]*)\]", hlo):
        dims = [int(d) for d in m.group(3).split(",") if d]
        elems = int(np.prod(dims)) if dims else 1
        if elems > T * D * 4:  # tokens-sized traffic allowance
            big.append(m.group(0))
    assert not big, f"expert-scale collective found:\n" + "\n".join(big)

    # and the partitioned layer must still be numerically right
    p_host = jax.tree.map(np.asarray, p)
    want = np.asarray(moe_layer(p_host, cfg, jnp.asarray(np.asarray(x))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
