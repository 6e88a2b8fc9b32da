"""C++ native components (csrc/native.cpp) vs the pure-Python references:
behavioral parity of the page allocator + prefix index and the ngram penalty."""

import numpy as np
import pytest

from zhilight_tpu.kvcache.allocator import PageAllocator
from zhilight_tpu.native import NativePageAllocator, load, native_ngram_penalty_map
from zhilight_tpu.engine.penalties import calc_repetition_ngram

pytestmark = pytest.mark.skipif(load() is None, reason="native toolchain unavailable")


def test_allocator_parity_random_ops():
    rng = np.random.RandomState(0)
    py = PageAllocator(32, 4, enable_prefix_cache=True)
    cc = NativePageAllocator(32, 4, enable_prefix_cache=True)
    held_py, held_cc = [], []
    for step in range(500):
        op = rng.randint(4)
        assert py.num_free == cc.num_free, f"free divergence at step {step}"
        if op == 0:  # alloc
            a, b = py.alloc_page(), cc.alloc_page()
            assert (a is None) == (b is None)
            if a is not None:
                held_py.append(a)
                held_cc.append(b)
        elif op == 1 and held_py:  # free
            i = rng.randint(len(held_py))
            py.free_page(held_py.pop(i))
            cc.free_page(held_cc.pop(i))
        elif op == 2 and held_py:  # ref + free (net zero)
            i = rng.randint(len(held_py))
            py.ref_page(held_py[i]); py.free_page(held_py[i])
            cc.ref_page(held_cc[i]); cc.free_page(held_cc[i])
        elif op == 3 and len(held_py) >= 2:  # register + rematch a prefix
            toks = list(rng.randint(0, 50, size=8))
            py.register_prefix(toks, held_py[:2])
            cc.register_prefix(toks, held_cc[:2])
            p_pages, p_n = py.match_prefix(toks + [1])
            c_pages, c_n = cc.match_prefix(toks + [1])
            assert p_n == c_n
            assert len(p_pages) == len(c_pages)
            py.free_pages(p_pages)
            cc.free_pages(c_pages)


def test_prefix_reuse_and_eviction():
    cc = NativePageAllocator(4, 4, enable_prefix_cache=True)
    pages = [cc.alloc_page() for _ in range(4)]
    toks = list(range(16))
    cc.register_prefix(toks, pages)
    cc.free_pages(pages)  # cached, rc=0
    got, n = cc.match_prefix(toks + [99])
    assert n == 16 and got == pages  # the extra token is left for prefill
    # a query of exactly the registered tokens must keep one token unprefixed
    cc.free_pages(got)
    got2, n2 = cc.match_prefix(toks)
    assert n2 == 12 and got2 == pages[:3]
    cc.free_pages(got2)
    # pool exhausted of fresh pages -> eviction must recycle cached ones
    fresh = [cc.alloc_page() for _ in range(4)]
    assert all(p is not None for p in fresh)


def test_ngram_parity():
    rng = np.random.RandomState(1)
    for _ in range(20):
        seq = list(rng.randint(0, 12, size=rng.randint(1, 40)))
        p = float(rng.uniform(1.01, 2.0))
        rep = float(rng.uniform(1.0, 1.5))
        native = native_ngram_penalty_map(seq, p, rep)
        ref = {t: v * rep for t, v in calc_repetition_ngram(seq[::-1], p).items()}
        assert set(native) == set(ref)
        for t in ref:
            assert abs(native[t] - ref[t]) < 1e-4 * max(1.0, ref[t])
