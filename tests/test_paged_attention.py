"""Paged flash-decode vs contiguous decode (interpret mode), + the allocator."""

import numpy as np
import pytest

import jax.numpy as jnp

from omchat_tpu.ops.attention import _xla_attention
from omchat_tpu.ops.paged_attention import PageAllocator, paged_flash_decode


def test_paged_decode_matches_contiguous(rng):
    B, H, KVH, D = 2, 8, 2, 128
    page_size, num_pages, max_pages = 128, 16, 4
    lengths = np.asarray([300, 150], np.int32)

    # contiguous truth
    T = max_pages * page_size
    k = rng.standard_normal((B, KVH, T, D)).astype(np.float32)
    v = rng.standard_normal((B, KVH, T, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))

    # scatter into a shared page pool with shuffled page tables
    alloc = PageAllocator(num_pages)
    k_pages = np.zeros((num_pages, KVH, page_size, D), np.float32)
    v_pages = np.zeros((num_pages, KVH, page_size, D), np.float32)
    tables = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        n_blocks = -(-int(lengths[b]) // page_size)
        pages = alloc.alloc(n_blocks)
        for i, pg in enumerate(pages):
            sl = slice(i * page_size, (i + 1) * page_size)
            k_pages[pg] = k[b, :, sl]
            v_pages[pg] = v[b, :, sl]
            tables[b, i] = pg

    ref = _xla_attention(
        q,
        jnp.asarray(k).transpose(0, 2, 1, 3),
        jnp.asarray(v).transpose(0, 2, 1, 3),
        causal=False,
        q_offset=None,
        kv_len=jnp.asarray(lengths),
    )
    out = paged_flash_decode(
        q,
        jnp.asarray(k_pages),
        jnp.asarray(v_pages),
        jnp.asarray(lengths),
        jnp.asarray(tables),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("C,block_q", [(256, 128), (384, 256)])
def test_paged_prefill_matches_contiguous(rng, C, block_q):
    """Pallas paged-prefill kernel (interpret) == dense causal attention on the
    same logical KV — chunk rows attend through the page table.  C=384 with
    block_q=256 exercises the gcd block fallback (bucketed tail-chunk widths
    need not be multiples of the preferred block)."""
    from omchat_tpu.ops.paged_attention import paged_flash_prefill

    B, H, KVH, D = 2, 8, 2, 128
    page_size, num_pages, max_pages = 128, 16, 4
    kv_len = np.asarray([min(128 + C, 512), 200], np.int32)
    q_offset = np.asarray([128, 0], np.int32)

    T = max_pages * page_size
    k = rng.standard_normal((B, KVH, T, D)).astype(np.float32)
    v = rng.standard_normal((B, KVH, T, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, C, H, D)).astype(np.float32))

    alloc = PageAllocator(num_pages)
    k_pages = np.zeros((num_pages, KVH, page_size, D), np.float32)
    v_pages = np.zeros((num_pages, KVH, page_size, D), np.float32)
    tables = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        n_blocks = -(-int(kv_len[b]) // page_size)
        for i, pg in enumerate(alloc.alloc(n_blocks)):
            sl = slice(i * page_size, (i + 1) * page_size)
            k_pages[pg] = k[b, :, sl]
            v_pages[pg] = v[b, :, sl]
            tables[b, i] = pg

    ref = _xla_attention(
        q,
        jnp.asarray(k).transpose(0, 2, 1, 3),
        jnp.asarray(v).transpose(0, 2, 1, 3),
        causal=True,
        q_offset=jnp.asarray(q_offset),
        kv_len=jnp.asarray(kv_len),
    )
    out = paged_flash_prefill(
        q,
        jnp.asarray(k_pages),
        jnp.asarray(v_pages),
        jnp.asarray(kv_len),
        jnp.asarray(tables),
        jnp.asarray(q_offset),
        block_q=block_q,
        interpret=True,
    )
    for b in range(B):
        valid = int(kv_len[b]) - int(q_offset[b])  # rows past this are padding
        np.testing.assert_allclose(
            np.asarray(out)[b, :valid], np.asarray(ref)[b, :valid], atol=2e-5, rtol=1e-4
        )


def test_page_allocator():
    a = PageAllocator(4)
    p1 = a.alloc(2)
    p2 = a.alloc(2)
    assert sorted(p1 + p2) == [0, 1, 2, 3]
    with pytest.raises(MemoryError):
        a.alloc(1)
    a.release(p1)
    assert a.available == 2


def test_manual_dma_decode_matches_production(rng):
    """The manual-DMA ring variant (grid (B,), NBUF pages in flight) is exact
    vs the auto-pipelined kernel, including ragged lengths and a partial last
    page."""
    from omchat_tpu.ops.paged_attention import (
        paged_flash_decode,
        paged_flash_decode_manual,
    )
    import jax.numpy as jnp

    B, H, KVH, D, ps, P = 2, 8, 2, 128, 16, 24
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    kp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)).astype(np.float32))
    vp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)).astype(np.float32))
    tables = jnp.asarray(
        np.stack([rng.permutation(P)[:8] for _ in range(B)]), jnp.int32
    )
    lengths = jnp.asarray([100, 37], jnp.int32)  # ragged, partial last pages
    ref = paged_flash_decode(q, kp, vp, lengths, tables, interpret=True)
    out = paged_flash_decode_manual(q, kp, vp, lengths, tables, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fp8_pool_both_kernels(rng):
    """fp8(e4m3) pages through BOTH pallas decode kernels (interpret):
    dequantize-on-load matches the xla fallback on the same quantized pool."""
    import jax.numpy as jnp

    from omchat_tpu.ops.paged_attention import (
        paged_decode_attention,
        paged_flash_decode,
        paged_flash_decode_manual,
    )

    B, H, KVH, D, ps, P = 2, 8, 2, 128, 16, 24
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    kp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)), jnp.float8_e4m3fn)
    vp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)), jnp.float8_e4m3fn)
    tables = jnp.asarray(np.stack([rng.permutation(P)[:8] for _ in range(B)]), jnp.int32)
    lengths = jnp.asarray([100, 37], jnp.int32)
    ref = paged_decode_attention(q, kp, vp, lengths, tables, impl="xla")
    auto = paged_flash_decode(q, kp, vp, lengths, tables, interpret=True)
    manual = paged_flash_decode_manual(q, kp, vp, lengths, tables, interpret=True)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_self_column_decode_matches_reference(rng):
    """Self-column mode (k_new/v_new carry the in-flight token, lengths
    EXCLUDE it) is exact vs attending a pool that already contains the token
    — both pallas kernels (interpret) and the xla fallback."""
    import jax.numpy as jnp

    from omchat_tpu.ops.paged_attention import (
        paged_decode_attention,
        paged_flash_decode,
        paged_flash_decode_manual,
    )

    B, H, KVH, D, ps, P = 2, 8, 2, 128, 16, 24
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    kp = np.asarray(rng.standard_normal((P, KVH, ps, D)), np.float32)
    vp = np.asarray(rng.standard_normal((P, KVH, ps, D)), np.float32)
    # DISJOINT page sets per row (one permutation split) — independent
    # permutations can share pages, so one row's truth-write would corrupt
    # the other row's reference input
    perm = rng.permutation(P)
    tables = np.stack([perm[:8], perm[8:16]]).astype(np.int32)
    lengths = np.asarray([100, 37], np.int32)  # tokens already in pages
    k_new = np.asarray(rng.standard_normal((B, KVH, D)), np.float32)
    v_new = np.asarray(rng.standard_normal((B, KVH, D)), np.float32)

    # truth: write the new token at (page, offset) and attend lengths+1
    kp_w, vp_w = kp.copy(), vp.copy()
    for b in range(B):
        page = tables[b, lengths[b] // ps]
        kp_w[page, :, lengths[b] % ps] = k_new[b]
        vp_w[page, :, lengths[b] % ps] = v_new[b]
    ref = paged_flash_decode(
        q, jnp.asarray(kp_w), jnp.asarray(vp_w),
        jnp.asarray(lengths + 1), jnp.asarray(tables), interpret=True,
    )

    args = (q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(lengths),
            jnp.asarray(tables), jnp.asarray(k_new), jnp.asarray(v_new))
    auto = paged_flash_decode(*args, interpret=True)
    manual = paged_flash_decode_manual(*args, interpret=True)
    xla = paged_decode_attention(
        q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(lengths),
        jnp.asarray(tables), impl="xla",
        k_new=jnp.asarray(k_new), v_new=jnp.asarray(v_new),
    )
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_self_column_stacked_contiguous_decode(rng):
    """flash_decode_stacked (read-only [L, B, KVH, T, D] cache + layer index
    + self-column) matches per-layer flash_decode on a written cache."""
    import jax.numpy as jnp

    from omchat_tpu.ops.decode_attention import flash_decode, flash_decode_stacked

    L, B, H, KVH, D, T = 3, 2, 8, 2, 128, 256
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    kc = np.asarray(rng.standard_normal((L, B, KVH, T, D)), np.float32)
    vc = np.asarray(rng.standard_normal((L, B, KVH, T, D)), np.float32)
    lengths = np.asarray([100, 37], np.int32)  # EXCLUDING the new token
    k_new = np.asarray(rng.standard_normal((B, KVH, D)), np.float32)
    v_new = np.asarray(rng.standard_normal((B, KVH, D)), np.float32)
    for li in range(L):
        kc_w, vc_w = kc[li].copy(), vc[li].copy()
        for b in range(B):
            kc_w[b, :, lengths[b]] = k_new[b]
            vc_w[b, :, lengths[b]] = v_new[b]
        ref = flash_decode(
            q, jnp.asarray(kc_w), jnp.asarray(vc_w), jnp.asarray(lengths + 1),
            interpret=True,
        )
        out = flash_decode_stacked(
            q, jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(lengths),
            jnp.int32(li), jnp.asarray(k_new), jnp.asarray(v_new),
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_commit_rows_touched(rng):
    """Window row-commit kernel (interpret): every (page, offset) target row
    holds its new K/V.  Aliasing (untouched bytes preserved) is TPU-only
    behavior — interpret mode does not simulate input_output_aliases; the
    on-chip check lives in dev/exp_commit.py (round 4: exact, 0.89 ms vs
    9.3 ms for the jnp scatter at the serving pool shape)."""
    import jax.numpy as jnp

    from omchat_tpu.ops.paged_attention import commit_rows

    P, KVH, PS, D = 12, 4, 16, 128
    pool = jnp.asarray(rng.standard_normal((P, KVH, PS, D)), jnp.float32)
    pages = np.asarray([3, 7, 1, 3], np.int32)
    offsets = np.asarray([5, 0, 15, 13], np.int32)  # two rows on page 3
    kr = np.asarray(rng.standard_normal((4, KVH, D)), np.float32)
    vr = np.asarray(rng.standard_normal((4, KVH, D)), np.float32)
    ko, vo = commit_rows(
        pool, jnp.copy(pool), jnp.asarray(pages), jnp.asarray(offsets),
        jnp.asarray(kr), jnp.asarray(vr), interpret=True,
    )
    ko, vo = np.asarray(ko), np.asarray(vo)
    for i in range(4):
        np.testing.assert_allclose(ko[pages[i], :, offsets[i]], kr[i], atol=1e-6)
        np.testing.assert_allclose(vo[pages[i], :, offsets[i]], vr[i], atol=1e-6)


def test_self_column_fp8_pool():
    """fp8(e4m3) pool + self-column decode + row commit: the kernels
    dequantize pool pages on load, the self-column K/V stay full precision,
    and commit_rows quantizes rows on write (pool dtype).

    Dedicated seed (not the session-scoped ``rng`` fixture): the tolerance
    covers the reference's extra fp8 rounding of one K/V row, whose magnitude
    is draw-dependent — a shared-state rng makes the test order-sensitive."""
    import jax.numpy as jnp

    from omchat_tpu.ops.paged_attention import commit_rows, paged_decode_attention

    rng = np.random.default_rng(3)

    B, H, KVH, D, ps, P = 2, 8, 2, 128, 16, 24
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    kp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)), jnp.float8_e4m3fn)
    vp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)), jnp.float8_e4m3fn)
    perm = rng.permutation(P)
    tables = np.stack([perm[:8], perm[8:16]]).astype(np.int32)
    lengths = np.asarray([100, 37], np.int32)
    k_new = np.asarray(rng.standard_normal((B, KVH, D)), np.float32)
    v_new = np.asarray(rng.standard_normal((B, KVH, D)), np.float32)

    # reference: quantize-write the token into the pool, attend lengths+1
    kp_w, vp_w = np.asarray(kp).copy(), np.asarray(vp).copy()
    for b in range(B):
        page = tables[b, lengths[b] // ps]
        kp_w[page, :, lengths[b] % ps] = k_new[b].astype(jnp.float8_e4m3fn)
        vp_w[page, :, lengths[b] % ps] = v_new[b].astype(jnp.float8_e4m3fn)
    ref = paged_decode_attention(
        q, jnp.asarray(kp_w, jnp.float8_e4m3fn), jnp.asarray(vp_w, jnp.float8_e4m3fn),
        jnp.asarray(lengths + 1), jnp.asarray(tables), impl="xla",
    )
    # self-column keeps the in-flight K/V full precision, so tolerance covers
    # the reference's extra fp8 rounding of that one row
    out = paged_decode_attention(
        q, kp, vp, jnp.asarray(lengths), jnp.asarray(tables), impl="xla",
        k_new=jnp.asarray(k_new), v_new=jnp.asarray(v_new),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)

    # commit quantizes on write
    pages_i = np.asarray([tables[b, lengths[b] // ps] for b in range(B)], np.int32)
    offs_i = np.asarray([lengths[b] % ps for b in range(B)], np.int32)
    ko, _ = commit_rows(
        kp, vp, jnp.asarray(pages_i), jnp.asarray(offs_i),
        jnp.asarray(k_new), jnp.asarray(v_new), interpret=True,
    )
    assert ko.dtype == jnp.float8_e4m3fn
    got = np.asarray(ko[pages_i[0], :, offs_i[0]].astype(jnp.float32))
    want = np.asarray(jnp.asarray(k_new[0]).astype(jnp.float8_e4m3fn).astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_commit_pages_kernel_matches_scatter(rng):
    """Aliased whole-page commit (interpret) == the jnp whole-page scatter:
    committed pages carry the chunk bytes, untouched pages survive, parking
    duplicates are allowed (content there is garbage by contract)."""
    from omchat_tpu.ops.paged_attention import commit_pages

    KVH, ps, D, P = 2, 16, 128, 12
    kp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)).astype(np.float32))
    vp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((5, KVH, ps, D)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((5, KVH, ps, D)).astype(np.float32))
    parked = P - 1
    pages = np.asarray([3, 7, parked, 0, parked], np.int32)  # incl. duplicates

    ref_k, ref_v = np.asarray(kp).copy(), np.asarray(vp).copy()
    ko, vo = commit_pages(kp, vp, jnp.asarray(pages), kc, vc, interpret=True)
    for i, p in enumerate(pages):
        if p != parked:
            ref_k[p] = np.asarray(kc[i])
            ref_v[p] = np.asarray(vc[i])
    keep = [p for p in range(P) if p != parked]
    np.testing.assert_allclose(np.asarray(ko)[keep], ref_k[keep], atol=1e-6)
    np.testing.assert_allclose(np.asarray(vo)[keep], ref_v[keep], atol=1e-6)


def test_commit_pages_jit_kernel_path_matches_scatter(rng):
    """_commit_pages_jit(use_kernel=True) == the scatter path on the same
    inputs (interpret-mode pallas under the hood on CPU is unavailable, so
    this exercises the index/flattening math with the kernel monkeypatched
    to its jnp equivalent)."""
    import omchat_tpu.ops.paged_attention as pa
    from omchat_tpu.runtime.paged_engine import _commit_pages_jit

    L, B, KVH, T, D, ps, P = 3, 2, 2, 32, 8, 16, 6
    slot_k = jnp.asarray(rng.standard_normal((L, B, KVH, T, D)).astype(np.float32))
    slot_v = jnp.asarray(rng.standard_normal((L, B, KVH, T, D)).astype(np.float32))
    kp_np = rng.standard_normal((L, P, KVH, ps, D)).astype(np.float32)
    vp_np = rng.standard_normal((L, P, KVH, ps, D)).astype(np.float32)
    tables = jnp.asarray(np.asarray([[0, 2, 4, 5], [1, 3, 5, 5]], np.int32))
    n_pages = jnp.asarray(np.asarray([2, 1], np.int32))

    want_k, want_v = _commit_pages_jit(
        slot_k, slot_v, jnp.asarray(kp_np), jnp.asarray(vp_np), tables, n_pages, ps)

    def fake_commit(k_pool, v_pool, pages, k_chunks, v_chunks, **kw):
        return k_pool.at[pages].set(k_chunks), v_pool.at[pages].set(v_chunks)

    orig = pa.commit_pages
    pa.commit_pages = fake_commit
    try:
        got_k, got_v = _commit_pages_jit(
            jnp.asarray(np.asarray(slot_k)), jnp.asarray(np.asarray(slot_v)),
            jnp.asarray(kp_np), jnp.asarray(vp_np),
            tables, n_pages, ps, use_kernel=True,
        )
    finally:
        pa.commit_pages = orig
    # parking page (P-1) content is garbage by contract on both paths
    keep = [p for p in range(P) if p != P - 1]
    np.testing.assert_allclose(np.asarray(got_k)[:, keep], np.asarray(want_k)[:, keep], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v)[:, keep], np.asarray(want_v)[:, keep], atol=1e-6)
