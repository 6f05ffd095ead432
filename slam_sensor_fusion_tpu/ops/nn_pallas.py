"""Pallas TPU kernel: pair-list gated nearest-neighbour search.

The performance-critical form of ops/nn_gated.py. Point clouds at this
pipeline's working sizes fit comfortably in VMEM, so the whole search runs
as a SINGLE kernel invocation:

  1. XLA-side: Morton-tile culling (ops/nn_gated.build_visit_lists)
     produces the admissible (src_tile, tgt_tile) pairs — bbox distance
     within the correspondence gate — flattened source-tile-major and
     padded to a static `max_pairs`; invalid points are moved to a far
     sentinel location so the kernel needs no mask logic at all;
  2. the kernel keeps both clouds and the outputs resident in VMEM and
     runs a scalar `fori_loop` over the LIVE pairs only (dynamic trip
     count from SMEM). Work scales with the actual number of admissible
     pairs (~2 per source tile on survey maps), not with any dense bound.

TPU-layout notes (the reason this kernel is fast):
  * points live as (n_tiles, 3, TILE) pages — dynamic indexing on the
    leading (untiled) axis is pure addressing, and each (3, TILE) page
    occupies 8 sublanes x TILE lanes with no 128-lane padding blowup;
  * distances are computed TRANSPOSED, d2[t, s], so the min/argmin
    reduce over sublanes and the per-source results land on lanes —
    matching the (1, TILE) output pages with zero relayouts;
  * the two norm vectors are produced in the right orientation by the
    MXU itself (contracting with a ones vector), never by a transpose.

Exactness contract matches ops/nn_gated.py: equal to the dense sweep for
every source point whose true NN lies within the gate radius; callers
discard everything else. Pair overflow (max_pairs / max_visits
truncation) drops farthest-first and is reported.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_sensor_fusion_tpu.ops.nn_gated import build_visit_lists

Array = jax.Array

# plain Python floats: jnp scalars would be captured constants inside the
# Pallas kernel, which pallas_call rejects
_BIG = 3.0e38
_FAR = 1.0e7  # sentinel coordinate for invalid points (d2 ~ 1e14 << _BIG)


class PallasNNResult(NamedTuple):
    d2: Array
    idx: Array
    overflow: Array  # () bool: max_pairs or max_visits truncated the list


def _build_pair_list(
    visits: Array, counts: Array, max_pairs: int
) -> tuple[Array, Array, Array]:
    """Flatten (visits, counts) into row-major (pair_src, pair_tgt, n)."""
    nSt = counts.shape[0]
    starts = jnp.cumsum(counts) - counts  # row start offsets
    total = jnp.sum(counts)
    pair_src = jnp.repeat(
        jnp.arange(nSt, dtype=jnp.int32), counts, total_repeat_length=max_pairs
    )
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    rank = p - jnp.take(starts, pair_src)
    pair_src = jnp.clip(pair_src, 0, nSt - 1)
    rank = jnp.clip(rank, 0, visits.shape[1] - 1)
    pair_tgt = visits[pair_src, rank]
    return pair_src, pair_tgt, jnp.minimum(total, max_pairs)


def _build_tile_pair_list(
    visits: Array, counts: Array, max_pairs: int
) -> tuple[Array, Array, Array]:
    """Flatten (visits, counts) into a row-major flat target list plus
    per-src-tile (start, count) offsets.

    The tile-major kernels (ops/icp_fused.py, ops/superblock_fused.py)
    walk src tiles in the outer loop and each tile's admitted target run
    `pair_tgt[start[i] : start[i] + cnt[i]]` in the inner loop, keeping
    the running best in registers. Truncation matches _build_pair_list:
    entries past `max_pairs` are dropped (counts clipped so that
    start + cnt <= max_pairs); callers flag overflow separately.
    """
    nSt = counts.shape[0]
    starts = jnp.cumsum(counts) - counts  # row start offsets
    pair_src = jnp.repeat(
        jnp.arange(nSt, dtype=jnp.int32), counts, total_repeat_length=max_pairs
    )
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    rank = p - jnp.take(starts, pair_src)
    pair_src = jnp.clip(pair_src, 0, nSt - 1)
    rank = jnp.clip(rank, 0, visits.shape[1] - 1)
    pair_tgt = visits[pair_src, rank]
    cnt = jnp.clip(jnp.minimum(counts, max_pairs - starts), 0)
    start = jnp.clip(starts, 0, max_pairs - 1)
    return start.astype(jnp.int32), cnt.astype(jnp.int32), pair_tgt


def _make_kernel(tile_src: int, tile_tgt: int):
    def kernel(
        pair_src_ref,  # (max_pairs,) SMEM
        pair_tgt_ref,  # (max_pairs,) SMEM
        n_pairs_ref,  # (1,) SMEM
        src_ref,  # (nSt, 3, TM) VMEM, rebased, invalid -> _FAR
        tgt_ref,  # (nTt, 3, TN) VMEM, rebased, invalid -> _FAR
        d2_ref,  # (nSt, 1, TM) VMEM out
        idx_ref,  # (nSt, 1, TM) VMEM out i32
        xyz_ref,  # (nSt, 3, TM) VMEM out — matched coords, rebased
    ):
        d2_ref[...] = jnp.full_like(d2_ref, _BIG)
        idx_ref[...] = jnp.zeros_like(idx_ref)
        xyz_ref[...] = jnp.zeros_like(xyz_ref)
        ones3 = jnp.ones((3, 1), jnp.float32)

        def body(p, _):
            i = pair_src_ref[p]
            j = pair_tgt_ref[p]
            s = src_ref[i]  # (3, TM)
            t = tgt_ref[j]  # (3, TN)
            # d2 transposed: rows = target (sublanes), cols = source (lanes)
            cross = jax.lax.dot_general(
                t,
                s,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TN, TM)
            s_norm = jnp.sum(s * s, axis=0, keepdims=True)  # (1, TM) on lanes
            t_norm = jax.lax.dot_general(
                t * t,
                ones3,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TN, 1) via MXU — no transpose op
            d2 = t_norm - 2.0 * cross + s_norm  # (TN, TM)
            tile_min = jnp.min(d2, axis=0, keepdims=True)  # (1, TM)
            arg = jnp.argmin(d2, axis=0).astype(jnp.int32)[None, :]  # (1, TM)
            tile_arg = arg + j * tile_tgt
            # winner COORDINATES via one-hot contraction on the MXU — the
            # downstream gather jnp.take(target, idx) would cost ~0.5 ms on
            # the VPU; this is 3 x TN x TM MACs instead
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_tgt, tile_src), 0)
            onehot = (rows == arg).astype(jnp.float32)  # (TN, TM)
            coords = jax.lax.dot_general(
                t,
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3, TM)
            old_d2 = d2_ref[i]
            better = tile_min < old_d2  # (1, TM)
            d2_ref[i] = jnp.where(better, tile_min, old_d2)
            idx_ref[i] = jnp.where(better, tile_arg, idx_ref[i])
            xyz_ref[i] = jnp.where(better, coords, xyz_ref[i])
            return 0

        jax.lax.fori_loop(0, n_pairs_ref[0], body, 0)

    return kernel


def make_pages(
    pts: Array, mask: Array, center: Array, tile: int, sentinel: float = _FAR
) -> Array:
    """(N, 3) + mask -> (n_tiles, 3, TILE) VMEM-friendly pages, rebased,
    with invalid points moved to the far sentinel.

    IMPORTANT: give source and target DIFFERENT sentinels (e.g. +_FAR and
    -_FAR) when downstream logic gates matches only by distance — two
    invalid points at the SAME sentinel location would otherwise "match"
    at distance zero.
    """
    n = pts.shape[0]
    safe = jnp.where(
        mask[:, None], (pts - center[None, :]).astype(jnp.float32), sentinel
    )
    return jnp.swapaxes(safe.reshape(n // tile, tile, 3), 1, 2)


def pair_nn(
    src_pages: Array,  # (nSt, 3, TM)
    tgt_pages: Array,  # (nTt, 3, TN)
    pair_src: Array,
    pair_tgt: Array,
    n_pairs: Array,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Run the pair-list kernel on prebuilt pages.

    Returns PAGE-layout outputs — d2 (nSt, 1, TM), idx (nSt, 1, TM),
    xyz (nSt, 3, TM) — with xyz the matched target coordinates in the
    REBASED frame the pages were built in. Keeping page layout end to end
    lets ICP's whole inner loop run without a single transpose.

    The split entry point lets ICP build the (expensive-ish) pair list and
    target pages ONCE per alignment and re-run only the kernel for every
    lazy re-association — the pair list stays valid as long as points move
    less than the dilation margin it was built with.
    """
    nSt, _, tile_src = src_pages.shape
    _, _, tile_tgt = tgt_pages.shape
    d2, idx, xyz = pl.pallas_call(
        _make_kernel(tile_src, tile_tgt),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nSt, 1, tile_src), jnp.float32),
            jax.ShapeDtypeStruct((nSt, 1, tile_src), jnp.int32),
            jax.ShapeDtypeStruct((nSt, 3, tile_src), jnp.float32),
        ],
        interpret=interpret,
    )(pair_src, pair_tgt, n_pairs[None], src_pages, tgt_pages)
    return jnp.maximum(d2, 0.0), idx, xyz


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius2",
        "tile_src",
        "tile_tgt",
        "max_visits",
        "max_pairs",
        "interpret",
    ),
)
def gated_nn_pallas(
    src: Array,
    src_mask: Array,
    tgt: Array,
    tgt_mask: Array,
    center: Array,
    radius2: float,
    tile_src: int = 256,
    tile_tgt: int = 512,
    max_visits: int = 24,
    max_pairs: int | None = None,
    interpret: bool = False,
) -> PallasNNResult:
    """Gated NN over Morton-sorted clouds — single-shot VMEM kernel."""
    M, N = src.shape[0], tgt.shape[0]
    nSt = M // tile_src
    nTt = N // tile_tgt
    if max_pairs is None:
        max_pairs = nSt * 8

    visits, counts, v_overflow = build_visit_lists(
        src, src_mask, tgt, tgt_mask, radius2, tile_src, tile_tgt, max_visits
    )
    pair_src, pair_tgt, n_pairs = _build_pair_list(visits, counts, max_pairs)
    overflow = v_overflow | (jnp.sum(counts) > max_pairs)
    del nTt

    src_pages = make_pages(src, src_mask, center, tile_src)
    tgt_pages = make_pages(tgt, tgt_mask, center, tile_tgt)
    d2, idx, _ = pair_nn(src_pages, tgt_pages, pair_src, pair_tgt, n_pairs, interpret)
    d2 = jnp.where(src_mask, d2.reshape(M), _BIG)
    return PallasNNResult(d2=d2, idx=idx.reshape(M), overflow=overflow)
