"""Continuous-batching scheduler.

Parity target: the reference's ``SearcherImplV1::batch_search`` hot loop
(src/generator/batch_generator.cpp:1445-1637) and ``TaskQueue`` admission
control (:89-180): admit under a free-KV-token budget, plan prefill (prefix
cache match + chunked prefill), run the model, sample, apply stop conditions,
stream results, evict finished tasks.

TPU adaptation: instead of one fused encode+search forward with ragged
tensors, each loop iteration issues (a) at most one prefill-chunk program on a
bucketed token count and (b) one fixed-shape decode program over the slot
batch, both asynchronously dispatched; pages replace ragged-buffer resizes.
"""

from __future__ import annotations

import os
import logging
import queue
import threading
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.engine_config import SchedulerConfig
from ..kvcache.allocator import make_page_allocator
from ..parallel.control_plane import ControlPlane, LocalPlane
from .beam import BeamGroup, BeamHypo
from ..models.base import DecodeMeta, PackedPrefillMeta, PrefillMeta
from ..ops.sampling import SamplingParams
from .engine import ModelExecutor
from .penalties import ngram_penalty_map
from .task import SearchTask, TaskStatus

logger = logging.getLogger(__name__)

__all__ = ["Scheduler"]


class _PlaneClosed(Exception):
    """Rank 0 closed the control channel: orderly worker shutdown."""


class Scheduler:
    def __init__(self, executor: ModelExecutor, plane: Optional[ControlPlane] = None):
        self.ex = executor
        # multi-host lockstep channel (reference engine_->broadcast_data,
        # batch_generator.cpp:1477-1480): rank 0 admits/cancels/closes, every
        # rank replays the identical loop so all hosts enter the same jits
        self.plane = plane or getattr(executor, "plane", None) or LocalPlane()
        self.cfg: SchedulerConfig = executor.sched_cfg
        self.queue: "queue.Queue[SearchTask]" = queue.Queue(maxsize=self.cfg.max_queue_size)
        self.allocator = make_page_allocator(
            executor.num_pages,
            executor.page_size,
            enable_prefix_cache=executor.cache_cfg.enable_prefix_caching,
        )
        self.max_batch = executor.max_batch
        # any member stops generation (HF generation_config eos lists)
        self.eos_ids = set(self.cfg.eos_ids) or {self.cfg.eos_id}
        self.slots: List[Optional[SearchTask]] = [None] * self.max_batch
        # tasks admitted but still prefilling (FIFO; one chunked at a time like
        # the reference's chunking_b single-task restriction)
        self.prefilling: List[SearchTask] = []
        # tasks whose KV pages were reclaimed under pressure (optimistic
        # admission's valve, reference SwapBuf batch_generator.cpp:329-358);
        # resumed FIFO with strict priority over new admissions
        self.preempted: List[SearchTask] = []
        self._admit_seq = 0
        self.num_preemptions = 0  # cumulative, for metrics/tests
        # beam tasks prefilled but waiting for their hypothesis slots; the
        # debt counter keeps later plain admissions from consuming the slots
        # they are owed (fixes beam head-of-line blocking: the primary
        # prefills immediately instead of stalling the whole queue until
        # beam_size slots are simultaneously free)
        self.beam_wait: List[SearchTask] = []
        self._slot_debt = 0
        self.num_beam_parks = 0  # cumulative, for metrics/tests
        self.num_packed_prefills = 0  # packed chunk programs run (metrics/tests)
        self.num_chunk_chains = 0  # chain programs run (metrics/tests)
        self.step_index = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._wake = threading.Event()
        self._active = 0
        self._lock = threading.Lock()
        # host-side mirror of per-slot sampling params; re-uploaded when dirty
        self._sp_host = {
            "temperature": np.zeros(self.max_batch, np.float32),
            "top_p": np.ones(self.max_batch, np.float32),
            "top_k": np.zeros(self.max_batch, np.int32),
            "min_p": np.zeros(self.max_batch, np.float32),
            "repetition_penalty": np.ones(self.max_batch, np.float32),
            "presence_penalty": np.zeros(self.max_batch, np.float32),
            "frequency_penalty": np.zeros(self.max_batch, np.float32),
            "seed": np.zeros(self.max_batch, np.int32),
        }
        self._sp_dirty = True
        self._sp_device: Optional[SamplingParams] = None
        # device-resident decode carry validity: True when the next decode
        # window may chain from device state without re-uploading
        self._decode_clean = False
        # pipelined decode windows: the dispatched-but-unfetched window, a
        # flag marking that a chained window is in flight over the current
        # slot set, and finished tasks whose page release is deferred until
        # that window drains (its writes still target their pages)
        self._pending = None
        self._spec_inflight = False
        self._deferred_release: List[SearchTask] = []
        # rank-0 queue occupancy after this step's admission, broadcast so
        # every host makes the same speculation decision (workers' local
        # queues are always drained by replay)
        self._queue_pressure = False
        # live beam-search groups keyed by primary task_id
        self.beam_groups: Dict[int, BeamGroup] = {}
        # persistent sessions: id -> (tokens, pages, kv_len, wall_ts, seq);
        # pages stay referenced between turns (reference session support,
        # batch_generator.cpp:1424-1444,1500-1516 + session_generator.py).
        # LRU eviction orders by seq (deterministic across hosts); TTL expiry
        # is a rank-0 wall-clock decision broadcast as a close event.
        self.sessions: Dict[str, tuple] = {}
        self._session_seq = 0
        # close_session requests from API threads, applied in-loop so every
        # host frees the pages at the same step: (sid, done_event, result_box)
        self._close_requests: List[tuple] = []
        self._close_lock = threading.Lock()

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def start(self):
        if self._thread is not None:
            return
        self._thread = threading.Thread(target=self._run, name="zhilight-scheduler", daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def submit(self, task: SearchTask, wait: bool = True):
        if self.plane.rank > 0:
            raise RuntimeError(
                "worker hosts accept no tasks; submit to the rank-0 server"
            )
        need = task.prompt_len + task.arg.max_length
        capacity = self.ex.num_pages * self.ex.page_size
        if need > capacity or task.prompt_len >= self.ex.engine_cfg.max_model_len:
            raise ValueError(
                f"task needs {need} KV tokens; capacity {capacity} "
                f"(max_model_len {self.ex.engine_cfg.max_model_len})"
            )
        self.queue.put(task, block=wait)
        self._wake.set()

    @property
    def active_size(self) -> int:
        return self._active

    def queue_size(self) -> int:
        return self.queue.qsize()

    def close_session(self, session_id: str) -> bool:
        """Release a session's retained KV pages (reference
        BatchGenerator::close_session). Applied inside the scheduler loop so
        allocator mutations stay single-threaded and every host in a
        multi-host mesh frees the pages at the same step."""
        if self.plane.rank > 0:
            return False  # worker hosts take session events from rank 0
        if self._thread is None or not self._thread.is_alive():
            return self._close_session_now(session_id)
        ev = threading.Event()
        box: List[bool] = []
        with self._close_lock:
            self._close_requests.append((session_id, ev, box))
        self._wake.set()
        if not ev.wait(timeout=30):
            return False
        return box[0]

    def _close_session_now(self, session_id: str) -> bool:
        sess = self.sessions.pop(session_id, None)
        if sess is None:
            return False
        self.allocator.free_pages(sess[1])
        return True

    def wait_all_done(self, timeout: Optional[float] = None):
        deadline = time.monotonic() + timeout if timeout else None
        while True:
            with self._lock:
                idle = (
                    self._active == 0
                    and self.queue.empty()
                    and not self.prefilling
                    and not self.preempted
                )
            if idle:
                return True
            if deadline and time.monotonic() > deadline:
                return False
            time.sleep(0.005)

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------
    def _run(self):
        logger.info("scheduler loop started (rank %d/%d)", self.plane.rank, self.plane.world)
        try:
            while not self._stop.is_set():
                did_work = self._step()
                if not did_work and self.plane.rank == 0:
                    # workers don't sleep: their _sync_step blocks on the
                    # control channel until rank 0's next iteration
                    self._wake.wait(timeout=0.002)
                    self._wake.clear()
        except _PlaneClosed:
            logger.info("control plane closed; worker scheduler exiting")
            return
        except BaseException as e:  # propagate to all tasks, mirror reference
            logger.exception("scheduler crashed")
            for t in list(self.slots) + self.prefilling + self.preempted:
                if t is not None and t.status not in (TaskStatus.FINISHED, TaskStatus.FAILED):
                    t.fail(e)
            while not self.queue.empty():
                try:
                    self.queue.get_nowait().fail(e)
                except queue.Empty:
                    break
            raise
        finally:
            if self.plane.rank == 0 and self.plane.world > 1:
                try:  # release workers blocked on the channel
                    self.plane.broadcast(None)
                except OSError:
                    pass
                self.plane.close()

    def _expired_sids(self) -> List[str]:
        """Rank-0 wall-clock TTL decision (broadcast as close events)."""
        ttl = self.cfg.session_ttl
        if not ttl or not self.sessions:
            return []
        now = time.monotonic()
        return [s for s, v in self.sessions.items() if now - v[3] > ttl]

    def _evict_lru_session(self) -> bool:
        """Free the least-recently-used idle session's pages (page pressure).
        Ordered by the deterministic store sequence, not wall time, so every
        host evicts the same victim."""
        if not self.sessions:
            return False
        sid = min(self.sessions, key=lambda s: self.sessions[s][4])
        logger.info("page pressure: evicting idle session %s", sid)
        self.allocator.free_pages(self.sessions.pop(sid)[1])
        return True

    def _cancelled(self, task: SearchTask) -> bool:
        """Loop-visible cancellation: multi-host uses only the flag set at
        step start (broadcast from rank 0), so all hosts agree."""
        return task.sched_cancelled or (self.plane.world == 1 and task.cancelled)

    def _apply_events(self, cancels: List[int], closes: List[str]) -> Dict[str, bool]:
        results: Dict[str, bool] = {}
        if cancels:
            cs = set(cancels)
            for t in list(self.slots) + self.prefilling + self.preempted:
                if t is not None and t.task_id in cs:
                    t.sched_cancelled = True
        for sid in closes:
            results[sid] = self._close_session_now(sid)
        return results

    def _sync_step(self):
        """Per-iteration lockstep point. Rank 0 collects this step's
        nondeterministic events (cancels, session closes, TTL expiries) and
        admissions, applies them, and broadcasts; workers receive and replay
        the identical sequence (reference: rank 0 pop_multi +
        broadcast_data(new_tasks), batch_generator.cpp:1461-1480)."""
        if self.plane.rank == 0:
            with self._close_lock:
                reqs, self._close_requests = self._close_requests, []
            closes = [sid for sid, _, _ in reqs] + self._expired_sids()
            cancels = []
            if self.plane.world > 1:
                cancels = [
                    t.task_id
                    for t in list(self.slots) + self.prefilling + self.preempted
                    if t is not None and t.cancelled and not t.sched_cancelled
                ]
            results = self._apply_events(cancels, closes)
            for sid, ev, box in reqs:
                box.append(results.get(sid, False))
                ev.set()
            admitted = self._admit()
            self._queue_pressure = not self.queue.empty()
            if self.plane.world > 1:
                self.plane.broadcast(
                    (cancels, closes, [t.to_wire() for t in admitted],
                     self._queue_pressure)
                )
            return
        payload = self.plane.broadcast(None)
        if payload is None:
            raise _PlaneClosed()
        cancels, closes, admitted_wire, self._queue_pressure = payload
        self._apply_events(cancels, closes)
        for d in admitted_wire:
            self.queue.put_nowait(SearchTask.from_wire(d))
        self._admit()
        if not self.queue.empty():  # states diverged — must never happen
            raise RuntimeError(
                f"worker admission replay diverged: {self.queue.qsize()} tasks "
                "not admitted under the local allocator state"
            )

    def _step(self) -> bool:
        self._sync_step()
        worked = False
        # decode BEFORE prefill: the decode window (and the successor of an
        # in-flight speculative window) enters the device queue ahead of the
        # prefill chunk, so decode fetches never wait behind chunk compute —
        # without this, TPOT p95 under mixed load spikes by ~chunk latency
        # (reference fuses encode+search groups into one forward instead,
        # join_forward, batch_generator.cpp:1337-1423). The chunk dispatched
        # below is async and fills the device queue behind the window.
        # the pending check matters when the LAST decoding tasks finished
        # while a speculative window was in flight: no slot is in DECODE any
        # more, but that window must still be drained (and the deferred page
        # releases flushed) or its slots/pages leak
        if self._pending is not None or any(
            t is not None and t.status == TaskStatus.DECODE for t in self.slots
        ):
            self._decode_step()
            worked = True
        if self.prefilling:
            worked = self._prefill_step() or worked
        return worked

    # ------------------------------------------------------------------
    # admission (reference pop_multi under token budget, :1461-1480)
    # ------------------------------------------------------------------
    def _free_slot(self) -> int:
        for i, t in enumerate(self.slots):
            if t is None:
                return i
        return -1

    def _outstanding_reserve(self) -> int:
        """Tokens promised to live tasks but not yet backed by pages. At
        ``admission_reserve=1.0`` admission against
        ``free - outstanding`` is truly worst-case: no task can ever stall on
        pages (beam hypotheses carry 0 — the primary holds the whole group's
        reservation, which over-counts shared pages, i.e. errs conservative)."""
        S = self.ex.page_size
        out = 0
        seen = set()
        for t in list(self.slots) + self.prefilling + self.preempted:
            if t is None or id(t) in seen:
                continue
            seen.add(id(t))
            out += max(0, t.reserved_tokens - len(t.pages) * S)
        return out

    def _admit(self) -> List[SearchTask]:
        """Admit queued tasks under the free-KV budget; returns the tasks
        admitted this step, in order (broadcast to workers for replay)."""
        admitted: List[SearchTask] = []
        # waiting beam groups claim their owed hypothesis slots first (oldest
        # admissions), then preempted tasks resume, then new admissions —
        # both with strict priority (otherwise fresh tasks could starve them
        # indefinitely by consuming freed slots/pages)
        self._service_beam_wait()
        while self.preempted:
            if not self._try_resume():
                return admitted
        while True:
            slot = self._free_slot()
            if slot < 0:
                return admitted
            if sum(t is None for t in self.slots) <= self._slot_debt:
                # remaining free slots are owed to waiting beam groups
                return admitted
            try:
                task = self.queue.queue[0]  # peek
            except IndexError:
                return admitted
            if task.cancelled and self.plane.rank == 0:
                # dropped pre-admission: never reached the workers
                self.queue.get_nowait()
                task.status = TaskStatus.CANCELLED
                task.finish()
                continue
            beams = max(task.arg.beam_size, 1)
            reserve = task.arg.max_length
            if beams == 1 and self.cfg.admission_reserve < 1.0:
                # optimistic admission: most generations stop well before
                # max_length; preemption reclaims pages if the bet loses
                reserve = max(1, int(reserve * self.cfg.admission_reserve))
            need = (task.prompt_len + reserve) * beams
            task.reserved_tokens = need
            if need > self.allocator.free_token_capacity() - self._outstanding_reserve():
                # idle sessions pin pages; evict the LRU one (never the
                # session this task is about to resume) before giving up
                own = task.arg.session_id if task.arg.session_continue else None
                cands = [s for s in self.sessions if s != own]
                if cands:
                    sid = min(cands, key=lambda s: self.sessions[s][4])
                    logger.info("admission pressure: evicting idle session %s", sid)
                    self.allocator.free_pages(self.sessions.pop(sid)[1])
                    continue
                return admitted  # wait for memory
            if beams > 1:
                # the primary is admitted alone and starts prefilling NOW;
                # the beams-1 hypothesis slots are owed (slot debt) and
                # claimed after the prefill completes (_service_beam_wait) —
                # the queue behind is never blocked waiting for beam_size
                # simultaneously-free slots
                self.queue.get_nowait()
                self._assign(task, slot)
                task._beam_group = None
                self._slot_debt += beams - 1
                admitted.append(task)
                continue
            self.queue.get_nowait()
            self._assign(task, slot)
            admitted.append(task)

    def _assign(self, task: SearchTask, slot: int):
        self._decode_clean = False
        task.slot = slot
        task.status = TaskStatus.PREFILL
        self.slots[slot] = task
        self._admit_seq += 1
        task.admit_seq = self._admit_seq
        with self._lock:
            self._active += 1

        sid = task.arg.session_id
        if sid and task.arg.session_continue and sid in self.sessions:
            # exact session KV reuse; rollback trims to sess_chunk_pos
            s_tokens, s_pages, s_len = self.sessions.pop(sid)[:3]
            usable = min(s_len, task.prompt_len - 1)
            if task.arg.sess_chunk_pos:
                usable = min(usable, task.arg.sess_chunk_pos)
            S = self.ex.page_size
            # the Pallas prefill write kernels DMA whole aligned pages
            # (ops/pallas/kv_write.py contract): resume only from a page
            # boundary and refeed the partial tail page's tokens
            usable -= usable % S
            # the retained KV must actually be a prefix of the new prompt;
            # on a reused/mismatched session_id fall back to fresh prefill
            # instead of attending over the wrong cached rows
            if s_tokens[:usable] != task.input_tokens[:usable]:
                logger.warning("session %s: token mismatch, discarding cached KV", sid)
                usable = 0
            keep = usable // S
            task.pages = s_pages[:keep]
            self.allocator.free_pages(s_pages[keep:])
            task.cache_len = usable
            task.prefix_hit_len = usable
        elif sid:
            # fresh session: skip prefix sharing so session pages stay private
            # (rollback rewrites page tails in place)
            task.pages = []
            task.cache_len = 0
            task.prefix_hit_len = 0
        elif task.input_embeddings is not None:
            # multimodal prompts must not share KV keyed on token ids alone:
            # identical placeholder ids can carry different images
            task.pages = []
            task.cache_len = 0
            task.prefix_hit_len = 0
        else:
            # prefix-cache match (reference match rag prefix, :1120-1122)
            pages, cached = self.allocator.match_prefix(task.input_tokens)
            task.pages = pages
            task.cache_len = cached
            task.prefix_hit_len = cached

        self._set_slot_params(task, slot)
        self.ex.record_prompt(slot, task.input_tokens)
        self.prefilling.append(task)

    def _set_slot_params(self, task: SearchTask, slot: int):
        """Load a task's sampling params into its slot's rows."""
        a = task.arg
        sp = self._sp_host
        sp["temperature"][slot] = a.sampling_temperature
        sp["top_p"][slot] = a.top_p
        sp["top_k"][slot] = a.top_k
        sp["min_p"][slot] = a.min_p
        # ngram tasks get the combined host-side penalty map (which already
        # multiplies in repetition_penalty); disable the count-based path
        sp["repetition_penalty"][slot] = (
            1.0 if a.ngram_penalty > 1.0 else a.repetition_penalty
        )
        sp["presence_penalty"][slot] = a.presence_penalty
        sp["frequency_penalty"][slot] = a.frequency_penalty
        sp["seed"][slot] = a.seed or task.task_id
        self._sp_dirty = True

    def _materialize_beam_group(self, task: SearchTask, extra_slots: List[int]):
        """Claim the hypothesis slots for a prefilled beam task and build its
        group (reference beam flow: hypotheses share the prefilled context).
        Called once the owed beams-1 slots are actually free."""
        slots = [task.slot] + list(extra_slots)
        hypo_tasks = [task]
        for s in slots[1:]:
            h = SearchTask(task.input_tokens, task.arg)
            h.slot = s
            h.status = TaskStatus.PREFILL  # parked until the group starts
            h._beam_group = None
            self.slots[s] = h
            with self._lock:
                self._active += 1
            # hypothesis slots share the primary's sampling params
            for k in self._sp_host:
                self._sp_host[k][s] = self._sp_host[k][task.slot]
            self._sp_dirty = True
            hypo_tasks.append(h)
        group = BeamGroup(task, slots)
        group.hypo_tasks = hypo_tasks
        for h in hypo_tasks:
            h._beam_group = group
        self.beam_groups[task.task_id] = group

    def _service_beam_wait(self):
        """Start waiting beam groups whose owed hypothesis slots are now free
        (FIFO). Their first-token candidates were computed at prefill time
        and are applied on claim."""
        while self.beam_wait:
            task = self.beam_wait[0]
            beams = max(task.arg.beam_size, 1)
            if self._cancelled(task):
                self.beam_wait.pop(0)
                self._slot_debt -= beams - 1
                task.status = TaskStatus.CANCELLED
                self._release(task)
                task.finish()
                continue
            free = [i for i, t in enumerate(self.slots) if t is None]
            if len(free) < beams - 1:
                return
            self.beam_wait.pop(0)
            self._slot_debt -= beams - 1
            self._materialize_beam_group(task, free[: beams - 1])
            toplp, toptok = task._beam_seed
            task._beam_seed = None
            self._init_beam_group(task, toplp, toptok)

    # ------------------------------------------------------------------
    # preemption / restore (reference SwapBuf, batch_generator.cpp:329-358)
    # ------------------------------------------------------------------
    def _preempt_mode(self) -> str:
        # per-host shard offload isn't wired for multi-host meshes; recompute
        # is pure host logic and replays deterministically on every rank
        if self.plane.world > 1:
            return "recompute"
        return self.cfg.preempt_mode

    def _preempt_one(self, newer_than: int) -> bool:
        """Reclaim the pages of the newest-admitted plain decode task (victim
        must be newer than the beneficiary, or pressure would invert FIFO
        priority). Swap mode downloads the written pages to host RAM first;
        recompute mode just drops them (the resume re-prefills prompt+output).
        Only legal with no decode window in flight — an in-flight program
        still writes to its tasks' pages."""
        if self._pending is not None:
            return False
        mode = self._preempt_mode()
        cands = [
            t
            for t in self.slots
            if t is not None
            and t.status == TaskStatus.DECODE
            and t.admit_seq > newer_than
            and getattr(t, "_beam_group", None) is None
            # recompute can't rebuild multimodal KV (the embeddings cover
            # only the prompt portion); swap restores it byte-identically
            and not (mode == "recompute" and t.input_embeddings is not None)
        ]
        if not cands:
            return False
        victim = max(cands, key=lambda t: t.admit_seq)
        S = self.ex.page_size
        # written KV rows cover positions 0..total_len-2: the last sampled
        # token's row is written by the NEXT decode step
        used = (victim.total_len - 1 + S - 1) // S
        if mode == "swap":
            rows = (
                np.asarray(victim.pages[:used], np.int64)[:, None] * S
                + np.arange(S)
            ).reshape(-1)
            victim.swap_state = self.ex.swap_out_rows(rows.astype(np.int32))
        logger.info(
            "page pressure: preempting task %d (%s, %d tokens, %d pages)",
            victim.task_id, mode, victim.total_len, len(victim.pages),
        )
        self.allocator.free_pages(victim.pages)
        victim.pages = []
        victim.cache_len = 0
        self.slots[victim.slot] = None
        victim.slot = -1
        with self._lock:
            self._active -= 1
        victim.status = TaskStatus.PREEMPTED
        self.preempted.append(victim)
        self.num_preemptions += 1
        self._decode_clean = False
        return True

    def _try_resume(self) -> bool:
        """Restore the oldest preempted task if a slot + its conservative KV
        need (cached context + full remaining output) are available — the
        conservative bound keeps a resumed task from thrashing back out."""
        task = self.preempted[0]
        if self._cancelled(task):
            self.preempted.pop(0)
            task.status = TaskStatus.CANCELLED
            task.swap_state = None
            task.finish()
            return True
        remaining = task.arg.max_length - len(task.output_tokens)
        need = task.total_len - 1 + remaining
        # its own (pageless) reservation is inside _outstanding_reserve
        avail = self.allocator.free_token_capacity() - (
            self._outstanding_reserve() - task.reserved_tokens
        )
        if need > avail:
            return False
        slot = self._free_slot()
        if slot < 0:
            return False
        task.reserved_tokens = need  # full remaining worst case: no thrash
        self.preempted.pop(0)
        task.slot = slot
        self.slots[slot] = task
        with self._lock:
            self._active += 1
        self._set_slot_params(task, slot)
        self.ex.record_prompt(slot, task.input_tokens + task.output_tokens)
        self._decode_clean = False
        if task.swap_state is not None:
            # restore the written rows (positions 0..total_len-2; the next
            # decode step writes total_len-1 as usual)
            ok = self._alloc_pages_to(task, task.total_len - 1)
            assert ok, "free-capacity check guarantees the pages"
            S = self.ex.page_size
            rows = (
                np.asarray(task.pages, np.int64)[:, None] * S + np.arange(S)
            ).reshape(-1)
            self.ex.swap_in_rows(rows.astype(np.int32), task.swap_state)
            task.swap_state = None
            task.cache_len = task.prompt_len
            task.status = TaskStatus.DECODE
            logger.info("resumed task %d from host swap", task.task_id)
        else:
            # recompute: re-prefill prompt + generated tokens (pure cache
            # writes; no sampling), then rejoin decode
            task.resume_decode = True
            task.status = TaskStatus.PREFILL
            self.prefilling.insert(0, task)
            logger.info("resumed task %d via recompute prefill", task.task_id)
        return True

    def _sampling_params(self) -> SamplingParams:
        if self._sp_dirty or self._sp_device is None:
            self._sp_device = SamplingParams(
                **{k: jnp.asarray(v) for k, v in self._sp_host.items()}
            )
            self._sp_dirty = False
        return self._sp_device

    # ------------------------------------------------------------------
    # host-computed logit maps (reference logit_bias :1709-1730 and ngram
    # penalty :1639-1708 / beam_util.cu)
    # ------------------------------------------------------------------
    @staticmethod
    def _round_width(n: int) -> int:
        w = 8
        while w < n:
            w *= 2
        return w

    def _bias_arrays(self) -> Optional[tuple]:
        """Batched [B, NB] (tokens, values) arrays from per-task logit_bias."""
        entries = {
            t.slot: t.arg.logit_bias
            for t in self.slots
            if t is not None and t.arg.logit_bias
        }
        if not entries:
            return None
        nb = self._round_width(max(len(v) for v in entries.values()))
        tok = np.full((self.max_batch, nb), -1, np.int32)
        val = np.zeros((self.max_batch, nb), np.float32)
        for slot, bias in entries.items():
            items = list(bias.items())[:nb]
            tok[slot, : len(items)] = [int(t) for t, _ in items]
            val[slot, : len(items)] = [float(v) for _, v in items]
        return tok, val

    def _penalty_arrays(self, tasks: List[SearchTask]) -> Optional[tuple]:
        """Batched [B, NP] multiplicative penalty maps for ngram tasks."""
        maps = {}
        for t in tasks:
            if t.arg.ngram_penalty > 1.0:
                maps[t.slot] = ngram_penalty_map(
                    t.input_tokens + t.output_tokens,
                    t.arg.ngram_penalty,
                    t.arg.repetition_penalty,
                )
        if not maps:
            return None
        np_ = self._round_width(max(len(m) for m in maps.values()))
        tok = np.full((self.max_batch, np_), -1, np.int32)
        val = np.ones((self.max_batch, np_), np.float32)
        for slot, m in maps.items():
            items = list(m.items())[:np_]
            tok[slot, : len(items)] = [int(t) for t, _ in items]
            val[slot, : len(items)] = [float(v) for _, v in items]
        return tok, val

    # ------------------------------------------------------------------
    # prefill (reference fill_encode_input + chunking, :1048-1212)
    # ------------------------------------------------------------------
    def _alloc_pages_to(self, task: SearchTask, target_tokens: int) -> bool:
        need_pages = (target_tokens + self.ex.page_size - 1) // self.ex.page_size
        while len(task.pages) < need_pages:
            page = self.allocator.alloc_page()
            if page is None:
                return False
            task.pages.append(page)
        return True

    def _finish_release(self, task: SearchTask):
        """Release a finished task's pages — unless a speculative decode
        window is still in flight over the old slot set (its writes target
        this task's pages); defer until that window is drained."""
        if self._spec_inflight:
            self._deferred_release.append(task)
            self._decode_clean = False
            return
        self._release(task)

    def _release(self, task: SearchTask):
        self._decode_clean = False
        sid = task.arg.session_id
        if sid and task.status == TaskStatus.FINISHED:
            # keep the session's KV pages referenced for the next turn
            old_sess = self.sessions.pop(sid, None)
            if old_sess is not None:
                self.allocator.free_pages(old_sess[1])
            self._session_seq += 1
            self.sessions[sid] = (
                task.input_tokens + task.output_tokens,
                list(task.pages),
                task.total_len,
                time.monotonic(),
                self._session_seq,
            )
            task.pages = []
        elif (
            self.allocator.enable_prefix_cache
            and task.status == TaskStatus.FINISHED
            and task.input_embeddings is None
        ):
            all_tokens = task.input_tokens + task.output_tokens
            self.allocator.register_prefix(all_tokens, task.pages)
        self.allocator.free_pages(task.pages)
        task.pages = []
        if task.slot >= 0:
            self.slots[task.slot] = None
            task.slot = -1
            with self._lock:
                self._active -= 1

    def _prefill_step(self) -> bool:
        group = self._pick_pack_group()
        if group is not None:
            return self._prefill_packed(group)
        return self._prefill_one()

    def _prefill_ctx(self, task: SearchTask):
        """Tokens a task still has to prefill (recompute-resume includes the
        generated tokens)."""
        return (
            task.input_tokens + task.output_tokens
            if task.resume_decode
            else task.input_tokens
        )

    def _packable(self, task: SearchTask, cap: int) -> bool:
        """A task joins a packed chunk when its whole remaining prefill fits
        one <= cap chunk and its first-token sampling is plain (beam seeding,
        logprobs, bias/penalty rows and multimodal embeddings keep the
        single-sequence program)."""
        remaining = len(self._prefill_ctx(task)) - task.cache_len
        if not (0 < remaining <= cap) or task.input_embeddings is not None:
            return False
        if task.resume_decode:
            return True  # pure cache writes, no sampling
        return (
            task.slot >= 0
            and task.arg.beam_size <= 1
            and not task.arg.logit_bias
            and task.arg.ngram_penalty <= 1.0
            and not task.arg.top_logprobs
        )

    def _pick_pack_group(self):
        """Packed multi-sequence prefill (reference encode groups,
        fill_encode_input packs every admitted prompt into one forward,
        batch_generator.cpp:1086-1212): under a burst of short prompts the
        single-sequence path costs O(N) sequential chunk programs, each
        re-streaming all weights. Strictly FIFO: the group must start at the
        queue head."""
        pack = self.cfg.prefill_pack
        if pack < 2 or not self.ex.supports_packed_prefill:
            return None
        cap = min(self.cfg.pack_chunk_cap, self.cfg.chunk_size)
        group = []
        for t in self.prefilling:
            if len(group) == pack:
                break
            if self._cancelled(t) or not self._packable(t, cap):
                break  # FIFO: never prefill past an unpackable task
            group.append(t)
        return group if len(group) >= 2 else None

    def _prefill_packed(self, group) -> bool:
        cap = min(self.cfg.pack_chunk_cap, self.cfg.chunk_size)
        S = self.ex.page_size
        members = []  # (task, chunk)
        for i, t in enumerate(group):
            ctx = self._prefill_ctx(t)
            chunk = len(ctx) - t.cache_len
            target = t.cache_len + chunk + (0 if t.resume_decode else 1)
            ok = True
            while not self._alloc_pages_to(t, target):
                if self._evict_lru_session():
                    continue
                if i == 0 and self._preempt_one(newer_than=t.admit_seq):
                    continue
                ok = False
                break
            if not ok:
                if i == 0:
                    return False  # OOM on the head: wait for pages
                break  # later members stay queued for the next round
            members.append((t, chunk))
        if len(members) < 2:
            return self._prefill_one()

        # pad the segment count to a static shape ({2, prefill_pack}) so a
        # burst never JIT-compiles a fresh (ns, tc) program mid-serving:
        # padded segments have q_lens == 0 / slot_mapping == -1 (no KV
        # writes, attention DMAs clamped) and warmup covers both shapes
        NS = 2 if len(members) == 2 else self.cfg.prefill_pack
        TC = self.ex.pick_bucket(max(c for _, c in members))
        T = NS * TC
        tokens = np.zeros(T, np.int32)
        positions = np.zeros(T, np.int32)
        slot_map = np.full(T, -1, np.int32)
        page_tables = np.full((NS, self.ex.max_pages_per_seq), -1, np.int32)
        cache_lens = np.zeros(NS, np.int32)
        q_lens = np.zeros(NS, np.int32)
        slots = np.full(NS, -1, np.int32)
        for s, (t, chunk) in enumerate(members):
            ctx = self._prefill_ctx(t)
            start = t.cache_len
            base = s * TC
            tokens[base : base + chunk] = ctx[start : start + chunk]
            if t.position_ids is not None:
                positions[base : base + chunk] = t.position_ids[start : start + chunk]
            else:
                positions[base : base + chunk] = np.arange(start, start + chunk)
            pages = np.asarray(t.pages, np.int32)
            pos = np.arange(start, start + chunk)
            slot_map[base : base + chunk] = pages[pos // S] * S + pos % S
            page_tables[s, : len(t.pages)] = t.pages
            cache_lens[s] = start
            q_lens[s] = chunk
            if not t.resume_decode:
                slots[s] = t.slot

        meta = PackedPrefillMeta(
            positions=jnp.asarray(positions),
            slot_mapping=jnp.asarray(slot_map),
            page_tables=jnp.asarray(page_tables),
            cache_lens=jnp.asarray(cache_lens),
            q_lens=jnp.asarray(q_lens),
        )
        tok, lp = self.ex.run_prefill_packed(
            tokens, meta, self._sampling_params(), slots
        )
        self.step_index += 1
        self.num_packed_prefills += 1
        now = time.monotonic()
        for s, (t, chunk) in enumerate(members):
            self.prefilling.remove(t)
            t.cache_len = t.cache_len + chunk
            t.status = TaskStatus.DECODE
            if t.resume_decode:
                t.resume_decode = False
            else:
                t.first_token_ts = now
                self._append_token(t, int(tok[s]), float(lp[s]), None, None)
        # the slot set changes NOW (see _prefill_one): decode windows in
        # flight consume the older invalidation
        self._decode_clean = False
        return True

    def _prefill_one(self) -> bool:
        task = self.prefilling[0]
        if self._cancelled(task):
            self.prefilling.pop(0)
            task.status = TaskStatus.CANCELLED
            self._release(task)
            task.finish()
            return True

        # decode-resume recompute re-prefills the generated tokens too
        ctx_tokens = (
            task.input_tokens + task.output_tokens
            if task.resume_decode
            else task.input_tokens
        )
        remaining = len(ctx_tokens) - task.cache_len
        chunk = min(remaining, self.cfg.chunk_size)
        is_last = chunk == remaining
        bucket = self.ex.pick_bucket(chunk)
        start = task.cache_len

        while not self._alloc_pages_to(task, start + chunk + (1 if is_last else 0)):
            if self._evict_lru_session():
                continue
            if self._preempt_one(newer_than=task.admit_seq):
                continue
            return False  # OOM: wait for pages (decode keeps draining)

        S = self.ex.page_size
        tokens = np.zeros(bucket, np.int32)
        tokens[:chunk] = ctx_tokens[start : start + chunk]
        positions = np.zeros(bucket, np.int32)
        if task.position_ids is not None:
            # multimodal custom positions (reference SearchTask.position_ids,
            # e.g. DeepSeek-VL2 image token layout)
            positions[:chunk] = task.position_ids[start : start + chunk]
        else:
            positions[:chunk] = np.arange(start, start + chunk)
        emb_chunk = None
        if task.input_embeddings is not None:
            emb_chunk = np.asarray(task.input_embeddings[start : start + chunk], np.float32)

        if (
            not is_last
            and emb_chunk is None
            and task.position_ids is None
            and self.ex.supports_fused_chunk
        ):
            page_table = np.full(self.ex.max_pages_per_seq, -1, np.int32)
            page_table[: len(task.pages)] = task.pages
            # chunk CHAIN: when no decode slot is waiting on this iteration,
            # dispatch C full chunks as one program (one upload + one
            # dispatch; the per-chunk tunnel round trips were ~90 ms of the
            # 3.7k-prompt TTFT). Decode-active iterations keep the one-chunk
            # cadence so TPOT never waits behind a multi-chunk program.
            CS = self.cfg.chunk_size
            n_total = -(-remaining // CS)
            chainable = n_total - 1  # the final chunk samples via run_prefill
            if chunk == CS and chainable >= 2 and os.environ.get(
                "ZT_NO_CHAIN"
            ) != "1" and not any(
                t is not None and t.status == TaskStatus.DECODE for t in self.slots
            ):
                C = next((c for c in self.ex.CHAIN_SIZES if c <= chainable), None)
                if C is not None and self._alloc_pages_to(task, start + C * CS):
                    page_table[: len(task.pages)] = task.pages
                    toks = np.asarray(
                        ctx_tokens[start : start + C * CS], np.int32
                    ).reshape(C, CS)
                    self.ex.run_chunk_chain(toks, jnp.asarray(page_table), start)
                    task.cache_len += C * CS
                    self.step_index += C
                    self.num_chunk_chains += 1
                    return True
            # hot path: meta built on device from (pages, [start, chunk]) —
            # one small upload instead of five per chunk
            self.ex.run_chunk_fused(tokens, jnp.asarray(page_table), start, chunk)
            task.cache_len += chunk
            self.step_index += 1
            return True

        slot_map = np.full(bucket, -1, np.int32)
        for i in range(chunk):
            pos = start + i
            slot_map[i] = task.pages[pos // S] * S + pos % S
        page_table = np.full(self.ex.max_pages_per_seq, -1, np.int32)
        page_table[: len(task.pages)] = task.pages

        meta = PrefillMeta(
            positions=jnp.asarray(positions),
            slot_mapping=jnp.asarray(slot_map),
            page_table=jnp.asarray(page_table),
            cache_len=jnp.int32(start),
            q_len=jnp.int32(chunk),
        )

        if not is_last:
            self.ex.run_chunk(tokens, meta, embeddings=emb_chunk)
            task.cache_len += chunk
            self.step_index += 1
            return True

        if task.resume_decode:
            # recompute resume: the final chunk is pure cache writes too (the
            # next token was already sampled before preemption) — rejoin the
            # decode batch directly
            self.ex.run_chunk(tokens, meta, embeddings=emb_chunk)
            task.cache_len = len(ctx_tokens)
            self.step_index += 1
            self.prefilling.pop(0)
            task.resume_decode = False
            task.status = TaskStatus.DECODE
            self._decode_clean = False
            return True

        bias = None
        if task.arg.logit_bias:
            items = list(task.arg.logit_bias.items())
            nb = self._round_width(len(items))
            btok = np.full((1, nb), -1, np.int32)
            bval = np.zeros((1, nb), np.float32)
            btok[0, : len(items)] = [int(t) for t, _ in items]
            bval[0, : len(items)] = [float(v) for _, v in items]
            bias = (btok, bval)
        pen = None
        if task.arg.ngram_penalty > 1.0:
            m = ngram_penalty_map(
                task.input_tokens, task.arg.ngram_penalty, task.arg.repetition_penalty
            )
            np_w = self._round_width(max(len(m), 1))
            ptok = np.full((1, np_w), -1, np.int32)
            pval = np.ones((1, np_w), np.float32)
            items = list(m.items())[:np_w]
            ptok[0, : len(items)] = [int(t) for t, _ in items]
            pval[0, : len(items)] = [float(v) for _, v in items]
            pen = (ptok, pval)

        beams = max(task.arg.beam_size, 1)
        num_lp = task.arg.top_logprobs if beams == 1 else min(2 * beams, 32)
        tok, lp, toplp, toptok = self.ex.run_prefill(
            tokens,
            meta,
            self._sampling_params(),
            task.slot,
            self.step_index,
            num_logprobs=num_lp,
            bias=bias,
            penalties=pen,
            embeddings=emb_chunk,
        )
        self.step_index += 1
        task.cache_len = task.prompt_len
        task.first_token_ts = time.monotonic()
        self.prefilling.pop(0)
        task.status = TaskStatus.DECODE
        # the slot set changes NOW — not at _assign time: decode windows run
        # while this task was still prefilling and consume the _assign-time
        # invalidation, after which the next window would chain from a
        # device carry whose row for this slot is stale (token 0, ctx 0)
        self._decode_clean = False
        if beams > 1:
            free = [i for i, t in enumerate(self.slots) if t is None]
            if len(free) >= beams - 1:
                self._slot_debt -= beams - 1
                self._materialize_beam_group(task, free[: beams - 1])
                self._init_beam_group(task, toplp, toptok)
            else:
                # hypothesis slots not free yet: park with the first-token
                # candidates; _service_beam_wait claims the owed slots as
                # other tasks finish (only this task waits, not the queue)
                task._beam_seed = (toplp, toptok)
                task.status = TaskStatus.PREFILL
                self.beam_wait.append(task)
                self.num_beam_parks += 1
        else:
            self._append_token(task, tok, lp, toplp, toptok)
        return True

    # ------------------------------------------------------------------
    # beam search (reference pick_top_k beam flow, batch_generator.cpp:1762+)
    # ------------------------------------------------------------------
    def _init_beam_group(self, task: SearchTask, toplp, toptok):
        """Seed the beam set from the prefill logits (first-token candidates).

        The prompt's full pages are ref-shared across hypotheses; a partial
        prompt tail page is cloned per hypothesis on device (reference
        BeamBufferManager buffer sharing / clone_block copy-on-write)."""
        group = self.beam_groups[task.task_id]
        # virtual single parent holding the prefilled context
        group.beams = [
            BeamHypo(slot=task.slot, pages=task.pages, output_tokens=[], cum_logprob=0.0)
        ]
        cands = [(0, int(t), float(l)) for t, l in zip(toptok, toplp)]
        next_beams = group.plan_update(
            cands, self.eos_ids, self.cfg.keep_eos, task.arg.max_length,
            self.cfg.ignore_eos or task.arg.ignore_eos,
        )
        if not next_beams or group.should_stop(next_beams):
            self._finish_beam_group(group)
            return
        self._apply_beam_assignment(group, next_beams)

    def _beam_update(self, group: BeamGroup, toplp, toptok):
        """One decode step's joint top-k beam update (K=1 windows)."""
        beams = group.beams
        num_top = min(2 * group.beam_size, 32)
        cands = []
        for i, h in enumerate(beams):
            b = h.slot
            for t, l in zip(toptok[0, b], toplp[0, b]):
                cands.append((h.cum_logprob + float(l), i, int(t), float(l)))
        cands.sort(key=lambda c: -c[0])
        cands = [(i, t, l) for _, i, t, l in cands[:num_top]]
        task = group.task
        next_beams = group.plan_update(
            cands, self.eos_ids, self.cfg.keep_eos, task.arg.max_length,
            self.cfg.ignore_eos or task.arg.ignore_eos,
        )
        if not next_beams or group.should_stop(next_beams):
            self._finish_beam_group(group)
            return
        self._apply_beam_assignment(group, next_beams)

    def _apply_beam_assignment(self, group: BeamGroup, next_beams):
        """Materialize the new beam set: assign slots, share/clone KV pages,
        refresh penalty counts."""
        self._decode_clean = False
        S = self.ex.page_size
        task = group.task
        old = group.beams
        slot_to_hypo = {h.slot: h for h in group.hypo_tasks}

        written = task.prompt_len + (len(old[0].output_tokens))
        # tokens written to cache so far (positions 0..written-1)
        full_pages = written // S
        has_partial = written % S != 0

        # slot assignment: a parent's first successor inherits its slot+pages
        taken = set()
        plan = []  # (parent_idx, token, cum, slot, inherit)
        for p_idx, tok, cum in next_beams:
            s = old[p_idx].slot
            if s not in taken:
                plan.append([p_idx, tok, cum, s, True])
                taken.add(s)
            else:
                plan.append([p_idx, tok, cum, None, False])
        free = [s for s in group.slots if s not in taken]
        for item in plan:
            if item[3] is None:
                item[3] = free.pop()

        src_rows: List[int] = []
        dst_rows: List[int] = []
        new_hypos: List[BeamHypo] = []
        inherited_parents = {item[0] for item in plan if item[4]}
        for p_idx, tok, cum, slot, inherit in plan:
            parent = old[p_idx]
            if inherit:
                pages = parent.pages  # take ownership of the same refs
            else:
                pages = []
                for pg in parent.pages[:full_pages]:
                    self.allocator.ref_page(pg)
                    pages.append(pg)
                if has_partial and full_pages < len(parent.pages):
                    np_pg = self.allocator.alloc_page()
                    if np_pg is None:
                        # page pressure: drop this candidate (narrower beam)
                        for pg in pages:
                            self.allocator.free_page(pg)
                        continue
                    src_pg = parent.pages[full_pages]
                    for j in range(S):
                        src_rows.append(src_pg * S + j)
                        dst_rows.append(np_pg * S + j)
                    pages.append(np_pg)
            lp = cum - parent.cum_logprob
            new_hypos.append(
                BeamHypo(
                    slot=slot,
                    pages=pages,
                    output_tokens=parent.output_tokens + [tok],
                    cum_logprob=cum,
                    logprobs=parent.logprobs + [lp],
                )
            )
        # release pages of parents with no inheritor
        for i, h in enumerate(old):
            if i not in inherited_parents:
                self.allocator.free_pages(h.pages)

        if src_rows:
            self.ex.copy_slots(np.asarray(src_rows), np.asarray(dst_rows))

        # sync hypo tasks (drive the decode loop) + penalty counts
        active_slots = set()
        for h in new_hypos:
            ht = slot_to_hypo[h.slot]
            ht.output_tokens = list(h.output_tokens)
            ht.pages = h.pages
            ht.cumulative_logprob = h.cum_logprob
            ht.status = TaskStatus.DECODE
            active_slots.add(h.slot)
            self.ex.record_prompt(h.slot, task.input_tokens + h.output_tokens)
        for s in group.slots:
            if s not in active_slots:
                ht = slot_to_hypo[s]
                ht.pages = []
                ht.status = TaskStatus.PREFILL  # parked
        group.beams = new_hypos

        # stream best hypothesis incrementally (reference update_stream)
        if task.stream and new_hypos:
            best = max(new_hypos, key=lambda h: h.cum_logprob)
            task.emit_stream([best.output_tokens[-1]])

    def _finish_beam_group(self, group: BeamGroup):
        """Emit the top num_results hypotheses and release all resources."""
        from .task import GenerativeOutput

        task = group.task
        # if the result manager isn't full, top up with live beams
        for h in sorted(group.beams, key=lambda h: -h.cum_logprob):
            if group.results.full:
                break
            score = h.cum_logprob / max(len(h.output_tokens), 1)
            group.results.add(list(h.output_tokens), h.cum_logprob, score)
        elapsed = time.monotonic() - task.begin_ts
        first_delay = (task.first_token_ts - task.begin_ts) if task.first_token_ts else 0.0
        outs = [
            GenerativeOutput(
                token_ids=tokens,
                score=score,
                time_elapsed=elapsed,
                first_token_delay=first_delay,
                finish_reason="stop",
            )
            for score, cum, tokens, _ in group.results.best()
        ]
        # release live beams' pages and every group slot
        for h in group.beams:
            self.allocator.free_pages(h.pages)
        for s in group.slots:
            ht = self.slots[s]
            if ht is not None:
                ht.pages = []
                self.slots[s] = None
                with self._lock:
                    self._active -= 1
        del self.beam_groups[task.task_id]
        self._decode_clean = False
        task.finish_multi(outs)
        self._wake.set()

    # ------------------------------------------------------------------
    # decode (reference fill_search_tokens + join_forward + sampling)
    # ------------------------------------------------------------------
    def _task_limit(self, task: SearchTask) -> int:
        """Max context_len a decode step may reach for this task: the step
        that samples the final (max_length-th) output token runs at
        context_len = prompt + max_length - 1."""
        return min(
            task.prompt_len + task.arg.max_length - 1,
            self.ex.engine_cfg.max_model_len,
        )

    def _force_k1(self) -> bool:
        # ngram penalties depend on the evolving sequence and beam reorders
        # are host-side, so both force single-step windows (mirrors the
        # reference applying them in the scheduler loop)
        return any(
            t is not None
            and t.status == TaskStatus.DECODE
            and (t.arg.ngram_penalty > 1.0 or getattr(t, "_beam_group", None) is not None)
            for t in self.slots
        )

    def _can_speculate(self, w) -> bool:
        """May ``w``'s successor window be dispatched before ``w``'s results
        are read? Only in steady-state decode: nothing prefilling or queued (a
        speculative window would delay their device time), no host-side
        per-step features, the device carry valid, AND the successor window
        fully usable by every active slot — pages are only allocated two
        windows ahead and limits are carried on device, so a successor past
        any slot's limit would run K full forward steps on frozen slots."""
        if not (
            self.ex.decode_window > 1
            and not self.prefilling
            and not self._queue_pressure
            and not self._force_k1()
            and self._decode_clean
        ):
            return False
        K = w["K"]
        ctx, lim = w["context_lens"], w["limits"]
        active = ctx > 0
        return bool(np.all(~active | (lim >= ctx + 2 * K - 1)))

    def _build_window(self, K: int, skip=None):
        """``skip(task)`` excludes a decode slot from this window: its
        context_lens/limits stay 0, so the program's validity mask freezes
        it (no writes, outputs discarded) — the beam-segregation windows
        use this to run plain slots at full K while beam slots idle, and
        vice versa."""
        B = self.max_batch
        S = self.ex.page_size
        tokens = np.zeros(B, np.int32)
        positions = np.zeros(B, np.int32)
        page_tables = np.full((B, self.ex.max_pages_per_seq), -1, np.int32)
        context_lens = np.zeros(B, np.int32)
        limits = np.zeros(B, np.int32)
        active: List[SearchTask] = []

        for b, task in enumerate(self.slots):
            if task is None or task.status != TaskStatus.DECODE:
                continue
            if skip is not None and skip(task):
                continue
            c0 = task.total_len  # context at the first window step
            limit = self._task_limit(task)
            # allocate pages two windows ahead (partial => the slot freezes
            # mid-window and resumes next window once pages free up); the
            # lookahead keeps page_tables stable so consecutive windows can
            # chain from device-resident state without re-uploading
            before = len(task.pages)
            self._alloc_pages_to(task, min(c0 + 2 * K - 1, limit))
            if len(task.pages) != before:
                self._decode_clean = False
            cap = len(task.pages) * S
            limit = min(limit, cap)
            if limit < c0:
                continue  # no page for even one step; retry next iteration
            tokens[b] = task.output_tokens[-1]
            positions[b] = c0 - 1
            context_lens[b] = c0
            limits[b] = limit
            page_tables[b, : len(task.pages)] = task.pages
            active.append(task)

        if not active:
            return None
        num_lp = max(
            (
                min(2 * t.arg.beam_size, 32)
                if getattr(t, "_beam_group", None) is not None
                else t.arg.top_logprobs
                for t in active
            ),
            default=0,
        )
        greedy_only = all(t.arg.sampling_temperature <= 0.0 for t in active)
        return dict(
            tokens=tokens, positions=positions, page_tables=page_tables,
            context_lens=context_lens, limits=limits, active=active,
            num_lp=num_lp, greedy_only=greedy_only, K=K,
        )

    def _dispatch_window(self, w, reuse_carry: bool):
        handle = self.ex.run_decode_multi(
            w["tokens"], w["page_tables"], w["positions"], w["context_lens"],
            w["limits"], self._sampling_params(), w["K"],
            num_logprobs=w["num_lp"],
            bias=self._bias_arrays(), penalties=self._penalty_arrays(w["active"]),
            greedy_only=w["greedy_only"],
            reuse_carry=reuse_carry,
            fetch=False,
        )
        self.step_index += w["K"]
        w["handle"] = handle
        return w

    @staticmethod
    def _slow_slot(t) -> bool:
        """Slots that force single-step windows (host-side beam reorders /
        evolving ngram penalties)."""
        return (
            getattr(t, "_beam_group", None) is not None
            or t.arg.ngram_penalty > 1.0
        )

    def _decode_segregated(self) -> None:
        """ZT_BEAM_SEGREGATE=1 evaluation mode: instead of dropping the whole
        batch to K=1 when a beam (or ngram) task is active, run (a) a full-K
        window over the PLAIN slots with the slow slots frozen, then (b) a
        K=1 step over the slow slots. Plain tasks keep window-amortized
        dispatch; slow tasks pay one extra weight stream per iteration.
        (Reference runs beams inside the same per-step host loop and pays no
        window cost because it HAS no windows — batch_generator.cpp:1540.)"""
        wA = self._build_window(self.ex.decode_window, skip=self._slow_slot)
        if wA is not None:
            self._decode_clean = False
            self._dispatch_window(wA, reuse_carry=False)
            self._process_window(wA, self.ex.fetch(wA["handle"]))
        wB = self._build_window(1, skip=lambda t: not self._slow_slot(t))
        if wB is not None:
            self._decode_clean = False
            self._dispatch_window(wB, reuse_carry=False)
            self._process_window(wB, self.ex.fetch(wB["handle"]))
        self._flush_deferred()

    def _decode_step(self):
        if self._force_k1():
            if os.environ.get("ZT_BEAM_SEGREGATE") == "1" and self._pending is None:
                plain = any(
                    t is not None and t.status == TaskStatus.DECODE
                    and not self._slow_slot(t)
                    for t in self.slots
                )
                if plain:
                    self._decode_segregated()
                    return
            K = 1
        else:
            K = self.ex.decode_window

        if self._pending is not None:
            # drain the in-flight window; in steady state, dispatch its
            # successor FIRST so the device keeps working through the host's
            # result processing (the reference hides per-token latency with
            # CUDA streams; this is the window-granular equivalent)
            pend, self._pending = self._pending, None
            nxt = None
            if self._can_speculate(pend):
                nxt = dict(pend)
                # the device carry advanced a full window for every slot
                # (speculation requires it); advance the host view to match
                nxt["context_lens"] = pend["context_lens"] + pend["K"]
                nxt["positions"] = pend["positions"] + pend["K"]
                self._dispatch_window(nxt, reuse_carry=True)
            res = self.ex.fetch(pend["handle"])
            self._spec_inflight = nxt is not None
            try:
                self._process_window(pend, res)
            finally:
                self._spec_inflight = False
            self._pending = nxt
            if nxt is None:
                self._flush_deferred()
            return

        w = self._build_window(K)
        if w is None:
            frozen = [
                t
                for t in self.slots
                if t is not None and t.status == TaskStatus.DECODE
            ]
            if frozen:
                # every decode slot is page-starved (possible only under
                # optimistic admission): free something or the loop livelocks
                if not self._evict_lru_session():
                    self._preempt_one(
                        newer_than=min(t.admit_seq for t in frozen)
                    )
            return
        reuse = self._decode_clean
        can_spec = self._can_speculate(w)  # evaluated BEFORE clearing the flag
        self._dispatch_window(w, reuse_carry=reuse)
        self._decode_clean = True
        if can_spec:
            # leave the window in flight; the next loop iteration drains it
            # (after dispatching its successor)
            self._pending = w
            return
        self._process_window(w, self.ex.fetch(w["handle"]))
        self._flush_deferred()

    def _flush_deferred(self):
        for task in self._deferred_release:
            self._release(task)
        self._deferred_release.clear()

    def _process_window(self, w, res):
        tok, lp, toplp, toptok = res
        K, num_lp = w["K"], w["num_lp"]
        context_lens, limits = w["context_lens"], w["limits"]
        handled_groups = set()
        active_slots = {t.slot for t in w["active"]}
        for task in w["active"]:
            group = getattr(task, "_beam_group", None)
            if group is not None:
                if id(group) in handled_groups:
                    continue
                handled_groups.add(id(group))
                if self._cancelled(group.task):
                    group.task.finish_reason = group.task.finish_reason or "abort"
                    self._finish_beam_group(group)
                    continue
                if not all(h.slot in active_slots for h in group.beams):
                    self._decode_clean = False  # starved beam: retry next loop
                    continue
                self._beam_update(group, toplp, toptok)
                continue
            if task.status != TaskStatus.DECODE:
                continue  # finished in an earlier window of this pipeline
            b = task.slot
            # clamped at 0: a slot frozen at its limit during the PREVIOUS
            # window of a pipelined chain starts this one already frozen —
            # the assumed-full-consumption context would make this negative
            # (and a negative slice would keep garbage tokens)
            n_valid = max(0, min(K, int(limits[b]) - int(context_lens[b]) + 1))
            if n_valid < K:
                self._decode_clean = False  # frozen mid-window: host resyncs
            self._append_window(
                task,
                tok[:n_valid, b],
                lp[:n_valid, b],
                toplp[:n_valid, b] if num_lp else None,
                toptok[:n_valid, b] if num_lp else None,
            )

    # ------------------------------------------------------------------
    # token accounting / stop conditions (reference :1500-1637)
    # ------------------------------------------------------------------
    def _append_window(self, task: SearchTask, toks, lps, toplps, toptoks):
        """Apply one window of sampled tokens to a task; tokens after a stop
        condition are discarded (the device kept decoding past it)."""
        emitted: List[int] = []
        finished = False
        stop_ids = task.arg.stop_token_ids or ()
        no_eos = self.cfg.ignore_eos or task.arg.ignore_eos
        for j, (tok, lp) in enumerate(zip(toks, lps)):
            tok = int(tok)
            is_eos = tok in self.eos_ids and not no_eos
            is_stop = tok in stop_ids
            # stop tokens are included in the output (reference
            # sampling_params.py:74-76 semantics); EOS is not (unless keep_eos)
            if (not is_eos or self.cfg.keep_eos) or (is_stop and not is_eos):
                task.output_tokens.append(tok)
                task.logprobs.append(float(lp))
                task.cumulative_logprob += float(lp)
                if task.arg.top_logprobs and toplps is not None:
                    task.top_logprobs.append(
                        {int(t): float(v) for t, v in zip(toptoks[j], toplps[j])}
                    )
                emitted.append(tok)
            cancelled = self._cancelled(task)
            if is_eos or is_stop or len(task.output_tokens) >= task.arg.max_length or cancelled:
                if not task.finish_reason:  # may be pre-set (e.g. stop-string hit)
                    if cancelled:
                        task.finish_reason = "abort"
                    elif is_eos or is_stop:
                        task.finish_reason = "stop"
                    else:
                        task.finish_reason = "length"
                finished = True
                break
        if emitted:
            task.emit_stream(emitted)
        if finished:
            if self._cancelled(task):
                task.status = TaskStatus.CANCELLED
            else:
                task.status = TaskStatus.FINISHED
            self._finish_release(task)
            task.finish()
            self._wake.set()

    def _append_token(self, task: SearchTask, tok: int, lp: float, toplp, toptok):
        self._append_window(
            task,
            [tok],
            [lp],
            [toplp] if toplp is not None else None,
            [toptok] if toptok is not None else None,
        )
