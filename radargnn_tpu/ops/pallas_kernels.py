"""Pallas TPU kernels for the message-passing hot path.

Two kernels (each with a pure-jnp reference used for allclose testing and as
the fallback everywhere Pallas is unavailable):

  * `fused_linear` — tiled matmul + bias (+ReLU) on the MXU. The edge
    pre-MLP is the FLOP-dominant op of the model (SURVEY.md §3.3); this is
    its standalone kernel.

  * `fused_message_segment_max` — the SpMM/SDDMM-style fusion the north star
    calls for: edge messages `m = m_in @ W + b` are computed tile-by-tile in
    VMEM and max-reduced into per-node accumulators WITHOUT materializing
    `m [E, H]` in HBM. Requires edges pre-sorted by receiver and tiled so
    that each edge tile's receivers stay inside one node block
    (`prepare_csr_tiles` does the host-side alignment); partial maxima
    accumulate in the revisited output block across the sequential TPU grid.

Both kernels run in interpret mode on CPU (the test path) and compiled on
TPU. Gathers stay in XLA — TPU gathers are fast and fusing them buys nothing
once `m` no longer round-trips through HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38                       # finite -inf stand-in (python float)

# f32 one-hot SELECTION matmuls must not ride Mosaic's default f32 dot:
# measured on the chip (r4), the default lowers f32×f32 to ONE bf16 MXU
# pass — a one-hot selection dot then returns exactly-bf16-rounded values
# (probe: |out − bf16(out)| = 0, |out − a| up to 8e-3), which silently
# rounded every "f32" landing's maxima AND broke the strict routing
# equality (the 1e-5 tolerance misses bf16 rounding by ~200×, dropping
# max-gradients). HIGHEST (multi-pass) is f32-exact; bf16-INPUT dots are
# unaffected (native MXU mode). Apply to every dot whose f32 values are
# SELECTED (landings, inner/g gathers), not to bf16-input compute dots.
_SEL_PRECISION = jax.lax.Precision.HIGHEST

# r5 experiment flag: the dense (v4) kernels' slot reduction/routing as a
# [k, R, H] leading-dim reshape (one reduce / one broadcast compare)
# instead of k-step slice loops + concatenate. Semantics identical.
import os as _os  # noqa: E402

_DENSE_RESHAPE = _os.environ.get("RADARGNN_DENSE_RESHAPE", "1") == "1"


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def check_overflow_sorted(ovf_r, where: str) -> None:
    """Host-side guard for the sorted-overflow kernel contract.

    Kernels built with the sorted segment_max lowering (`ovf_sorted=True`
    in make_fused_hoisted_aggregate_v3; always in
    make_fused_dense_aggregate) require the VALID overflow receivers
    (entries >= 0) to be non-decreasing — then the cummax padding fill
    keeps the whole index vector sorted. An unsorted vector silently
    corrupts segment maxima ON THE CHIP only (CPU treats
    `indices_are_sorted` as a hint and stays correct, so tests cannot
    catch a violation — the r4 halo path shipped one). The loader tilers
    (prepare_windowed_csr_tiles / prepare_dense_knn_tiles) emit sorted
    overflow by construction; this check catches hand-built lists at the
    eager call boundary (traced values inside jit are skipped — the plan
    build in graph.batch.pad_sample asserts the same contract on host
    numpy)."""
    if isinstance(ovf_r, jax.core.Tracer):
        return
    r = np.asarray(ovf_r)
    v = r[r >= 0]
    if v.size > 1 and np.any(np.diff(v) < 0):
        raise ValueError(
            f"{where}: overflow receivers must be non-decreasing over "
            "valid entries (the kernel was built for the sorted "
            "segment_max lowering). Sort the overflow list by receiver, "
            "or build the windowed aggregate with ovf_sorted=False (the "
            "halo path's opt-out — its per-shard overflow is not "
            "receiver-sorted in augmented-index space).")


# ---------------------------------------------------------------------------
# fused linear
# ---------------------------------------------------------------------------

def _linear_kernel(x_ref, w_ref, b_ref, o_ref, *, relu: bool):
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = y + b_ref[0, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[:] = y


@functools.partial(jax.jit, static_argnames=("relu", "tile", "interpret"))
def fused_linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 relu: bool = False, tile: int = 512,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """y = x @ w + b (+ReLU), tiled over rows; [E, Din] @ [Din, H]."""
    if interpret is None:
        interpret = _interpret_default()
    e, din = x.shape
    h = w.shape[1]
    pad = (-e) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    grid = (xp.shape[0] // tile,)
    out = pl.pallas_call(
        functools.partial(_linear_kernel, relu=relu),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], h), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w, b.reshape(1, h))
    return out[:e]


def fused_linear_reference(x, w, b, relu=False):
    y = x @ w + b
    return jnp.maximum(y, 0.0) if relu else y


# ---------------------------------------------------------------------------
# fused message matmul + segment max
# ---------------------------------------------------------------------------

def prepare_csr_tiles(receivers: np.ndarray, edge_mask: np.ndarray,
                      num_nodes: int, node_block: int, edge_tile: int,
                      total_tiles: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side tiling: sorts edges by receiver and pads each node block's
    edge run to a multiple of `edge_tile`.

    Returns (perm, tile_node_block, padded_receivers):
      perm [E_pad]           — gather indices into the original edge arrays
                               (dummy slots map to edge 0),
      tile_node_block [T]    — node-block id per edge tile,
      padded_receivers [E_pad] — global receiver id per slot, -1 for
                               padding/masked slots (matches no node row, so
                               no separate mask operand is needed).
    The caller gathers m_in with `perm`.
    """
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask)
    e = receivers.shape[0]
    # masked edges sort to the end of their (irrelevant) block: give them
    # receiver num_nodes (a virtual overflow block)
    key = np.where(edge_mask, receivers, num_nodes)
    order = np.argsort(key, kind="stable")
    sorted_recv = key[order]

    num_blocks = -(-num_nodes // node_block)
    perm_chunks = []
    recv_chunks = []
    tile_blocks = []
    for blk in range(num_blocks):
        lo = np.searchsorted(sorted_recv, blk * node_block, side="left")
        hi = np.searchsorted(sorted_recv, min((blk + 1) * node_block,
                                              num_nodes), side="left")
        run = order[lo:hi]
        pad = (-len(run)) % edge_tile
        if len(run) == 0:
            pad = edge_tile          # dummy tile so the block gets initialized
        perm_chunks.append(np.concatenate([run, np.zeros(pad, np.int64)]))
        recv_chunks.append(np.concatenate(
            [receivers[run], np.full(pad, -1, np.int64)]))
        tile_blocks.extend([blk] * ((len(run) + pad) // edge_tile))

    if not perm_chunks:
        perm_chunks = [np.zeros(edge_tile, np.int64)]
        recv_chunks = [np.full(edge_tile, -1, np.int64)]
        tile_blocks = [0]

    perm = np.concatenate(perm_chunks)
    padded_recv = np.concatenate(recv_chunks)

    if total_tiles is not None:
        # pad to a static tile budget with no-op tiles of the last block so
        # the kernel shape never depends on the in-degree distribution
        cur = len(tile_blocks)
        if cur > total_tiles:
            raise ValueError(f"need {cur} tiles, budget {total_tiles}")
        extra = total_tiles - cur
        if extra:
            perm = np.concatenate([perm, np.zeros(extra * edge_tile, np.int64)])
            padded_recv = np.concatenate(
                [padded_recv, np.full(extra * edge_tile, -1, np.int64)])
            tile_blocks = list(tile_blocks) + [tile_blocks[-1]] * extra

    return (perm.astype(np.int32), np.asarray(tile_blocks, np.int32),
            padded_recv.astype(np.int32))


def _spread_place_vectorized(run, rr, bounds, degs, t, edge_tile, run_cap,
                             receivers):
    """Vectorized spread placement for one node block, or None when the
    round-robin layout would overflow a tile (caller falls back to the
    sequential greedy packer). Semantics identical to the greedy path: every
    tile holds at most `run_cap` edges per receiver as one contiguous run;
    unplaceable chunks (receiver needs more than t distinct tiles) are
    returned as leftover edge ids for the overflow path."""
    n_ch = -(-degs // run_cap)                       # chunks per receiver
    r_count = len(degs)
    # rank receivers by descending chunk count (stable) so heavy receivers
    # spread first — mirrors the greedy order and balances fill
    rank = np.empty(r_count, np.int64)
    rank[np.argsort(-n_ch, kind="stable")] = np.arange(r_count)
    place_ch = np.minimum(n_ch, t)                   # placeable chunks
    tot = int(place_ch.sum())
    if tot == 0:
        return None
    rec = np.repeat(np.arange(r_count), place_ch)
    j = np.arange(tot) - np.repeat(np.cumsum(place_ch) - place_ch, place_ch)
    tile = (rank[rec] + j) % t
    size = np.minimum(run_cap, degs[rec] - j * run_cap)
    fill = np.bincount(tile, weights=size, minlength=t)
    if fill.max() > edge_tile:
        return None

    # leftover: chunks j >= t of over-degree receivers
    left = []
    for ri in np.flatnonzero(n_ch > t):
        a = bounds[ri] + t * run_cap
        left.append(run[a:bounds[ri + 1]])

    # order chunks by (tile, receiver) → receiver-contiguous runs per tile
    order_c = np.lexsort((rr[bounds[rec]], tile))
    starts_e = (bounds[rec] + j * run_cap)[order_c]
    sizes_o = size[order_c].astype(np.int64)
    csum = np.cumsum(sizes_o) - sizes_o
    offs = np.repeat(starts_e, sizes_o)         + (np.arange(int(sizes_o.sum())) - np.repeat(csum, sizes_o))
    ids_all = run[offs]
    tile_of_edge = np.repeat(tile[order_c], sizes_o)  # non-decreasing
    te_counts = np.bincount(tile_of_edge, minlength=t).astype(np.int64)
    dst = np.repeat(np.arange(t) * edge_tile, te_counts)         + (np.arange(len(ids_all))
           - np.repeat(np.cumsum(te_counts) - te_counts, te_counts))
    out_ids = np.zeros(t * edge_tile, np.int64)
    out_recv = np.full(t * edge_tile, -1, np.int64)
    out_ids[dst] = ids_all
    out_recv[dst] = receivers[ids_all]
    return (list(out_ids.reshape(t, edge_tile)),
            list(out_recv.reshape(t, edge_tile)), left)


def prepare_spread_csr_tiles(receivers: np.ndarray, edge_mask: np.ndarray,
                             num_nodes: int, node_block: int, edge_tile: int,
                             run_cap: int,
                             total_tiles: Optional[int] = None):
    """Spread tiling: like prepare_csr_tiles, but each receiver's edges are
    distributed across its node block's tiles so that no tile holds more
    than `run_cap` edges of the same receiver (one contiguous chunk each).

    With run_cap == 2**p the windowed kernels' segmented-max roll loop needs
    only p passes — run_cap=1 removes it ENTIRELY: the per-tile landing
    one-hot matmul (MXU) plus the cross-tile o_ref max already reduce
    per-receiver maxima when every receiver appears at most once per tile.
    The forward kernel then has no [TE,H]-wide VPU roll/select chain — the
    measured VPU bottleneck of the v3 forward (docs/RESULTS.md).

    The tile count per block is unchanged (ceil(block_edges/edge_tile)):
    spreading only permutes edges among a block's existing tiles. Edges that
    cannot be placed under the cap (receiver in-degree > tiles*run_cap, or
    packing fragmentation) are returned in `leftover` for the caller's
    overflow path.

    Returns (perm, tile_node_block, padded_receivers, leftover_edge_idx).
    """
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask)
    key = np.where(edge_mask, receivers, num_nodes)
    order = np.argsort(key, kind="stable")
    sorted_recv = key[order]

    num_blocks = -(-num_nodes // node_block)
    perm_chunks = []
    recv_chunks = []
    tile_blocks = []
    leftover = []
    for blk in range(num_blocks):
        lo = np.searchsorted(sorted_recv, blk * node_block, side="left")
        hi = np.searchsorted(sorted_recv, min((blk + 1) * node_block,
                                              num_nodes), side="left")
        run = order[lo:hi]                       # edge ids, receiver-sorted
        rr = sorted_recv[lo:hi]
        eb = len(run)
        t = max(1, -(-eb // edge_tile))
        if eb == 0:
            perm_chunks.append(np.zeros(edge_tile, np.int64))
            recv_chunks.append(np.full(edge_tile, -1, np.int64))
            tile_blocks.append(blk)
            continue
        # receiver runs within the block
        starts = np.flatnonzero(np.diff(rr, prepend=rr[0] - 1))
        bounds = np.append(starts, eb)
        degs = np.diff(bounds)

        # fast path (r2 advisor item): fully vectorized round-robin chunk
        # placement — receiver rank r's chunk j lands in tile (r+j) mod t,
        # which guarantees distinct tiles per receiver whenever
        # n_chunks <= t. Falls back to the greedy packer when a tile would
        # overflow (rare: tiles have ~5% slack on kNN degree profiles).
        placed = _spread_place_vectorized(run, rr, bounds, degs, t,
                                          edge_tile, run_cap, receivers)
        if placed is not None:
            p_chunks, r_chunks, left = placed
            perm_chunks.extend(p_chunks)
            recv_chunks.extend(r_chunks)
            tile_blocks.extend([blk] * t)
            leftover.extend(left)
            continue

        fill = np.zeros(t, np.int64)
        tiles: list = [[] for _ in range(t)]     # (receiver, edge-id chunk)
        # descending chunk-count first: high-degree receivers need the most
        # distinct tiles, place them while every tile still has room
        for ri in np.argsort(-degs, kind="stable"):
            a, b = bounds[ri], bounds[ri + 1]
            chunks = [run[c:min(c + run_cap, b)]
                      for c in range(a, b, run_cap)]
            used = 0
            for tid in np.argsort(fill, kind="stable"):
                if used >= len(chunks):
                    break
                c = chunks[used]
                if fill[tid] + len(c) <= edge_tile:
                    tiles[tid].append((rr[a], c))
                    fill[tid] += len(c)
                    used += 1
            leftover.extend(chunks[used:])
        for tid in range(t):
            tiles[tid].sort(key=lambda rc: rc[0])  # receiver-contiguous runs
            ids = (np.concatenate([c for _, c in tiles[tid]])
                   if tiles[tid] else np.zeros(0, np.int64))
            pad = edge_tile - len(ids)
            perm_chunks.append(np.concatenate([ids, np.zeros(pad, np.int64)]))
            recv_chunks.append(np.concatenate(
                [receivers[ids], np.full(pad, -1, np.int64)]))
            tile_blocks.append(blk)

    if not perm_chunks:
        # no node blocks at all (num_nodes == 0): one dummy tile of block 0,
        # mirroring prepare_csr_tiles' fallback
        perm_chunks = [np.zeros(edge_tile, np.int64)]
        recv_chunks = [np.full(edge_tile, -1, np.int64)]
        tile_blocks = [0]

    perm = np.concatenate(perm_chunks)
    padded_recv = np.concatenate(recv_chunks)
    if total_tiles is not None:
        cur = len(tile_blocks)
        if cur > total_tiles:
            raise ValueError(f"need {cur} tiles, budget {total_tiles}")
        extra = total_tiles - cur
        if extra:
            perm = np.concatenate([perm, np.zeros(extra * edge_tile,
                                                  np.int64)])
            padded_recv = np.concatenate(
                [padded_recv, np.full(extra * edge_tile, -1, np.int64)])
            tile_blocks = list(tile_blocks) + [tile_blocks[-1]] * extra
    left = (np.concatenate(leftover) if leftover
            else np.zeros(0, np.int64))
    return (perm.astype(np.int32), np.asarray(tile_blocks, np.int32),
            padded_recv.astype(np.int32), left.astype(np.int64))


def tile_roll_passes(padded_seg: np.ndarray, edge_tile: int) -> np.ndarray:
    """Per-tile log-roll pass count for the segmented cummax kernels.

    For each edge tile of the CSR layout (prepare_csr_tiles output), returns
    ceil(log2(longest run of equal non-negative segment ids)) — the number
    of equality-gated rolls needed for the in-tile inclusive cummax to cover
    every run. Runs that wrap tile boundaries need no extra passes (the
    output block max-combines partial landings across tiles).
    """
    v = np.asarray(padded_seg).reshape(-1, edge_tile)
    t = v.shape[0]
    valid = v >= 0
    change = np.ones_like(v, dtype=bool)
    change[:, 1:] = v[:, 1:] != v[:, :-1]
    run_id = np.cumsum(change, axis=1)          # 1..edge_tile per row
    ids = np.arange(t)[:, None] * (edge_tile + 1) + run_id
    ids = np.where(valid, ids, 0)               # invalid slots -> global 0
    counts = np.bincount(ids.ravel(), minlength=t * (edge_tile + 1))
    counts = counts[: t * (edge_tile + 1)].reshape(t, edge_tile + 1)
    counts[:, 0] = 0                            # bucket 0 held invalid slots
    max_run = counts.max(axis=1)
    return np.ceil(np.log2(np.maximum(max_run, 1))).astype(np.int32)


def morton_order(pos: np.ndarray, bits: int = 16) -> np.ndarray:
    """Spatial (Z-order) node permutation: argsort of interleaved-bit Morton
    codes of the 2D positions. Orders nodes so that kNN neighborhoods map to
    short contiguous index ranges — the windowed kernels' locality source.
    """
    pos = np.asarray(pos, np.float64)
    if pos.shape[0] == 0:
        return np.zeros((0,), np.int32)
    lo = pos.min(axis=0)
    span = np.maximum(pos.max(axis=0) - lo, 1e-9)
    q = ((pos - lo) / span * ((1 << bits) - 1)).astype(np.uint64)

    def _part(v):
        v = v & np.uint64(0xFFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    code = _part(q[:, 0]) | (_part(q[:, 1]) << np.uint64(1))
    return np.argsort(code, kind="stable").astype(np.int32)


def _monotone_tile_windows(hist: np.ndarray, wb: int) -> np.ndarray:
    """Optimal MONOTONE window-start sequence over the tile axis (DP).

    `hist [T, num_blocks]` holds per-tile sender-node-block counts; the
    returned `tile_win [T]` maximizes total in-window edges subject to
    window starts being non-decreasing (monotonicity: a backward dx part
    must never revisit an already-flushed block)."""
    t, num_blocks = hist.shape
    nmax = num_blocks - wb
    csum = np.concatenate(
        [np.zeros((t, 1), np.int64), np.cumsum(hist, axis=1)], axis=1)
    cover = csum[:, wb:] - csum[:, :-wb]          # [t, nmax+1]
    idx = np.arange(nmax + 1)
    dp = cover[0].astype(np.int64)
    back = np.zeros((t, nmax + 1), np.int32)
    back[0] = idx
    for i in range(1, t):
        pm = np.maximum.accumulate(dp)
        pmi = np.maximum.accumulate(np.where(dp == pm, idx, 0))
        dp = cover[i] + pm
        back[i] = pmi
    tile_win = np.empty(t, np.int64)
    w = int(np.argmax(dp))
    for i in range(t - 1, -1, -1):
        tile_win[i] = w
        w = int(back[i][w])
    return tile_win


def prepare_windowed_csr_tiles(senders: np.ndarray, receivers: np.ndarray,
                               edge_mask: np.ndarray, num_nodes: int,
                               node_block: int, edge_tile: int,
                               window_blocks: int,
                               total_tiles: Optional[int] = None,
                               ovf_budget: Optional[int] = None,
                               run_cap: Optional[int] = None):
    """Windowed CSR tiling: per receiver block, senders are covered by a
    window of `window_blocks` consecutive node blocks (host-chosen best
    cover, monotone across blocks so the kernels' revisit-zeroing works).
    Edges whose sender misses the window go to a fixed-budget overflow list
    handled by the XLA path. With Morton-ordered nodes (morton_order) the
    overflow is a few percent for kNN graphs.

    Returns (perm, tile_blocks, padded_recv, senders_local, tile_win,
    ovf_idx):
      perm/tile_blocks/padded_recv — as prepare_csr_tiles, in-window edges,
      senders_local [E_pad] — sender id minus its tile's window start
                              (in [0, window_blocks*node_block)), -1 pads,
      tile_win [T]           — window start block per tile (monotone),
      ovf_idx [ovf_budget]   — original-edge indices of overflow, -1 pads.
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask)
    num_blocks = -(-num_nodes // node_block)
    wb = min(window_blocks, num_blocks)

    # tile ALL valid edges by receiver first, then choose the best
    # wb-wide sender window PER TILE (tiles span ~TE/deg receivers, so
    # their sender spread is far tighter than a whole receiver block's);
    # edges outside their tile's window become dead slots + overflow
    spread_left = np.zeros(0, np.int64)
    if run_cap is not None:
        # run-capped spread tiling (roll_passes = log2(run_cap) in the
        # kernel); unplaceable edges join the overflow list below
        perm, tile_blocks, padded_recv, spread_left = \
            prepare_spread_csr_tiles(receivers, edge_mask, num_nodes,
                                     node_block, edge_tile, run_cap,
                                     total_tiles)
    else:
        perm, tile_blocks, padded_recv = prepare_csr_tiles(
            receivers, edge_mask, num_nodes, node_block, edge_tile,
            total_tiles)
    t = len(tile_blocks)
    valid = padded_recv >= 0
    sp = senders[perm]
    s_blk = np.where(valid, sp // node_block, 0)
    tile_ids = np.repeat(np.arange(t), edge_tile)
    hist = np.zeros((t, num_blocks), np.int64)
    np.add.at(hist, (tile_ids[valid], s_blk[valid]), 1)
    tile_win = _monotone_tile_windows(hist, wb)

    win_start_e = np.repeat(tile_win, edge_tile) * node_block
    in_win = valid & (sp >= win_start_e) \
        & (sp < win_start_e + wb * node_block)
    ovf_slots = valid & ~in_win
    ovf = np.concatenate([perm[ovf_slots], spread_left])

    if ovf_budget is None:
        ovf_budget = max(edge_tile,
                         -(-int(edge_mask.sum() * 0.08) // edge_tile)
                         * edge_tile)
    if len(ovf) > ovf_budget:
        raise ValueError(f"window overflow {len(ovf)} exceeds budget "
                         f"{ovf_budget}; increase window_blocks or budget")
    # receiver-sorted so the XLA overflow path's segment ops take the
    # sorted-scatter fast path
    ovf = ovf[np.argsort(receivers[ovf], kind="stable")]
    ovf_idx = np.full(ovf_budget, -1, np.int64)
    ovf_idx[:len(ovf)] = ovf

    padded_recv = np.where(ovf_slots, -1, padded_recv)
    senders_local = np.where(in_win, sp - win_start_e, -1)

    # compact in-window edges to the front of each tile (stable, so the
    # receiver sort survives): dead overflow slots in the middle of a
    # same-receiver run would break the segmented-max rolls and the
    # is_last landing
    slot_order = np.argsort(tile_ids * 2 + (~in_win), kind="stable")
    perm = perm[slot_order]
    padded_recv = padded_recv[slot_order]
    senders_local = senders_local[slot_order]

    return (perm, tile_blocks, padded_recv,
            senders_local.astype(np.int32), tile_win.astype(np.int32),
            ovf_idx.astype(np.int32))


def window_part_mask(tile_win: np.ndarray, num_blocks: int,
                     window_blocks: int) -> np.ndarray:
    """[WB, num_blocks] bool: which node blocks each backward dx part
    writes (part j of a tile writes block tile_win+j). Blocks a part never
    visits hold uninitialized memory and are masked out with jnp.where."""
    mask = np.zeros((window_blocks, num_blocks), bool)
    tw = np.unique(np.asarray(tile_win))
    for j in range(window_blocks):
        blocks = np.minimum(tw + j, num_blocks - 1)
        mask[j, blocks] = True
    return mask


def _msg_segmax_scan_kernel(tile_blocks_ref, m_in_ref, w_ref, b_ref,
                            recv_ref, o_ref, *, node_block: int,
                            edge_tile: int):
    """Scan variant: bidirectional segmented log-roll max (every edge ends
    up holding its segment's max — equality of receiver ids gates the merge,
    which also makes circular wrap-around self-correct), then ONE one-hot
    MXU matmul pair (sum & count, sum/count == max since all summands are
    equal) to land the per-node rows. O(log(TE)·TE·H) VPU + O(TN·TE·H) MXU.
    """
    t = pl.program_id(0)
    blk = tile_blocks_ref[t]
    is_first_tile_of_block = jnp.logical_or(
        t == 0, tile_blocks_ref[jnp.maximum(t - 1, 0)] != blk)

    @pl.when(is_first_tile_of_block)
    def _():
        o_ref[:] = jnp.full_like(o_ref, _NEG)

    m = jnp.dot(m_in_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    m = m + b_ref[0, :]

    local2d = (recv_ref[pl.ds(t, 1), :] - blk * node_block)   # [1, TE] int32

    r = m
    shift = 1
    while shift < edge_tile:
        # pltpu.roll needs non-negative shifts; size-shift == negative roll
        for direction in (shift, edge_tile - shift):
            l_roll = pltpu.roll(local2d, direction, axis=1)
            match = (l_roll == local2d).astype(jnp.float32)    # [1, TE]
            match_col = jnp.transpose(match)                   # [TE, 1]
            r_roll = pltpu.roll(r, direction, axis=0)
            merged = jnp.maximum(r, r_roll)
            r = r * (1.0 - match_col) + merged * match_col
        shift *= 2

    # land rows: eq [TN, TE] one-hot; all summands of a row equal the max
    rows = jax.lax.broadcasted_iota(jnp.int32, (node_block, edge_tile), 0)
    eq = (rows == jnp.broadcast_to(local2d, (node_block, edge_tile))
          ).astype(jnp.float32)
    sums = jnp.dot(eq, r, preferred_element_type=jnp.float32,
                   precision=_SEL_PRECISION)                    # [TN, H]
    cnt = jnp.sum(eq, axis=1, keepdims=True)                    # [TN, 1]
    has = (cnt > 0).astype(jnp.float32)
    out_tile = sums / jnp.maximum(cnt, 1.0) * has + (has - 1.0) * (-_NEG)
    o_ref[:] = jnp.maximum(o_ref[:], out_tile)


def _msg_segmax_kernel(tile_blocks_ref, m_in_ref, w_ref, b_ref, recv_ref,
                       o_ref, *, node_block: int, edge_tile: int):
    t = pl.program_id(0)
    blk = tile_blocks_ref[t]
    is_first_tile_of_block = jnp.logical_or(
        t == 0, tile_blocks_ref[jnp.maximum(t - 1, 0)] != blk)

    @pl.when(is_first_tile_of_block)
    def _():
        o_ref[:] = jnp.full_like(o_ref, _NEG)

    m = jnp.dot(m_in_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    m = m + b_ref[0, :]

    # invalid slots carry receiver -1 → local id out of [0, TN) → they match
    # no output row; no separate mask operand needed
    local = recv_ref[t, :] - blk * node_block         # [TE] in [0, TN)
    h = m.shape[-1]
    chunk = min(16, edge_tile)
    rows = jax.lax.broadcasted_iota(jnp.int32, (node_block, chunk), 0)

    # static unrolled chunking (Mosaic has no dynamic_slice on values)
    acc = jnp.full((node_block, h), _NEG)
    for c in range(edge_tile // chunk):
        mc = m[c * chunk:(c + 1) * chunk]
        lc = local[c * chunk:(c + 1) * chunk]
        eq = (rows == lc[None, :]).astype(jnp.float32)    # [TN, chunk]
        big = mc[None, :, :] * eq[:, :, None] \
            + (eq[:, :, None] - 1.0) * (-_NEG)
        acc = jnp.maximum(acc, jnp.max(big, axis=1))
    o_ref[:] = jnp.maximum(o_ref[:], acc)


@functools.partial(jax.jit,
                   static_argnames=("num_nodes", "node_block", "edge_tile",
                                    "interpret", "variant"))
def fused_message_segment_max(m_in: jnp.ndarray, w: jnp.ndarray,
                              b: jnp.ndarray, padded_receivers: jnp.ndarray,
                              tile_blocks: jnp.ndarray,
                              num_nodes: int, node_block: int = 128,
                              edge_tile: int = 128,
                              interpret: Optional[bool] = None,
                              variant: str = "scan") -> jnp.ndarray:
    """out[n] = max over edges e with receiver n of (m_in[e] @ w + b).

    Inputs must be pre-permuted with `prepare_csr_tiles` (receivers sorted,
    node-block aligned). Empty segments yield 0 (framework semantics).
    """
    if interpret is None:
        interpret = _interpret_default()
    e_pad, din = m_in.shape
    h = w.shape[1]
    t = e_pad // edge_tile
    nb_pad = -(-num_nodes // node_block) * node_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((edge_tile, din), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            # small receiver table stays fully resident in VMEM
            pl.BlockSpec((t, edge_tile), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, h), lambda i, tb: (tb[i], 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = (_msg_segmax_scan_kernel if variant == "scan"
              else _msg_segmax_kernel)
    out = pl.pallas_call(
        functools.partial(kernel, node_block=node_block,
                          edge_tile=edge_tile),
        out_shape=jax.ShapeDtypeStruct((nb_pad, h), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_blocks, m_in, w, b.reshape(1, h),
      padded_receivers.astype(jnp.int32).reshape(t, edge_tile))

    out = out[:num_nodes]
    return jnp.where(out <= _NEG / 2, 0.0, out)


def fused_message_segment_max_reference(m_in, w, b, receivers, mask,
                                        num_nodes):
    """jnp reference with identical semantics (unsorted inputs fine)."""
    from radargnn_tpu.ops.segment import segment_max

    m = m_in @ w + b
    return segment_max(m, receivers, num_nodes, mask)


# ---------------------------------------------------------------------------
# fused hoisted aggregation (model integration)
# ---------------------------------------------------------------------------

def _hoisted_scan_kernel(tile_blocks_ref, add_ref, e_ref, w_ref, b_ref,
                         recv_ref, o_ref, *, node_block: int, edge_tile: int):
    """Scan-variant kernel for the model's hoisted max path:
    operand = add + e @ W_e + b, segment-max over receivers."""
    t = pl.program_id(0)
    blk = tile_blocks_ref[t]
    is_first_tile_of_block = jnp.logical_or(
        t == 0, tile_blocks_ref[jnp.maximum(t - 1, 0)] != blk)

    @pl.when(is_first_tile_of_block)
    def _():
        o_ref[:] = jnp.full_like(o_ref, _NEG)

    m = add_ref[:].astype(jnp.float32) \
        + jnp.dot(e_ref[:], w_ref[:],
                  preferred_element_type=jnp.float32) + b_ref[0, :]

    local2d = (recv_ref[pl.ds(t, 1), :] - blk * node_block)   # [1, TE]

    r = m
    shift = 1
    while shift < edge_tile:
        for direction in (shift, edge_tile - shift):
            l_roll = pltpu.roll(local2d, direction, axis=1)
            match = (l_roll == local2d).astype(jnp.float32)
            match_col = jnp.transpose(match)
            r_roll = pltpu.roll(r, direction, axis=0)
            merged = jnp.maximum(r, r_roll)
            r = r * (1.0 - match_col) + merged * match_col
        shift *= 2

    rows = jax.lax.broadcasted_iota(jnp.int32, (node_block, edge_tile), 0)
    eq = (rows == jnp.broadcast_to(local2d, (node_block, edge_tile))
          ).astype(jnp.float32)
    sums = jnp.dot(eq, r, preferred_element_type=jnp.float32,
                   precision=_SEL_PRECISION)
    cnt = jnp.sum(eq, axis=1, keepdims=True)
    has = (cnt > 0).astype(jnp.float32)
    out_tile = sums / jnp.maximum(cnt, 1.0) * has + (has - 1.0) * (-_NEG)
    o_ref[:] = jnp.maximum(o_ref[:], out_tile)


def _hoisted_pallas_call(add, e_t, w_e, b, padded_receivers, tile_blocks,
                         num_nodes, node_block, edge_tile, interpret):
    e_pad, h = add.shape
    de = e_t.shape[1]
    t = e_pad // edge_tile
    nb_pad = -(-num_nodes // node_block) * node_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((edge_tile, h), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, de), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((de, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, edge_tile), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, h), lambda i, tb: (tb[i], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_hoisted_scan_kernel, node_block=node_block,
                          edge_tile=edge_tile),
        out_shape=jax.ShapeDtypeStruct((nb_pad, h), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_blocks, add, e_t, w_e, b.reshape(1, h),
      padded_receivers.astype(jnp.int32).reshape(t, edge_tile))
    return out[:num_nodes]


def make_fused_hoisted_aggregate(num_nodes: int, node_block: int = 128,
                                 edge_tile: int = 256,
                                 interpret: Optional[bool] = None):
    """Builds the fused hoisted max-aggregation op with a custom VJP.

    Forward (Pallas): inner[n] = max over tiled edges with receiver n of
    (y_s[senders_t] + e_t @ w_e + b); output aggr = offset + inner for
    non-empty n, 0 otherwise — the hoisted-MPNNConv aggregation without the
    [E, H] operand ever hitting HBM.

    Backward (XLA): recomputes the operand, routes gradients to edges within
    a small tolerance of their segment max (the kernel's mean-landing makes
    the forward value approximate at ~1e-7 relative; near-ties share the
    gradient, which matches max-subgradient semantics closely enough for
    training).
    """
    if interpret is None:
        interpret = _interpret_default()

    @jax.custom_vjp
    def fused(y_s, e_t, w_e, b, senders_t, padded_recv, tile_blocks, offset):
        inner = _hoisted_pallas_call(
            y_s[senders_t], e_t, w_e, b, padded_recv, tile_blocks,
            num_nodes, node_block, edge_tile, interpret)
        has = inner > _NEG / 2
        return jnp.where(has, offset + inner, 0.0)

    def fwd(y_s, e_t, w_e, b, senders_t, padded_recv, tile_blocks, offset):
        inner = _hoisted_pallas_call(
            y_s[senders_t], e_t, w_e, b, padded_recv, tile_blocks,
            num_nodes, node_block, edge_tile, interpret)
        has = inner > _NEG / 2
        out = jnp.where(has, offset + inner, 0.0)
        return out, (y_s, e_t, w_e, b, senders_t, padded_recv, inner, has)

    def bwd(res, g):
        y_s, e_t, w_e, b, senders_t, padded_recv, inner, has = res
        valid = padded_recv >= 0
        recv_c = jnp.where(valid, padded_recv, 0)

        operand = y_s[senders_t] + e_t @ w_e + b
        inner_at_e = inner[recv_c]
        sel = valid[:, None] & (jnp.abs(operand - inner_at_e)
                                <= 1e-5 * jnp.abs(inner_at_e) + 1e-5)
        g_pass = jnp.where(has, g, 0.0)
        d_op = jnp.where(sel, g_pass[recv_c], 0.0)

        d_y_s = jax.ops.segment_sum(d_op, senders_t,
                                    num_segments=y_s.shape[0])
        d_e_t = d_op @ w_e.T
        d_w_e = e_t.T @ d_op
        d_b = jnp.sum(d_op, axis=0)
        d_offset = g_pass
        return d_y_s, d_e_t, d_w_e, d_b, None, None, None, d_offset

    fused.defvjp(fwd, bwd)
    return fused


# ---------------------------------------------------------------------------
# CSR-tiled segment sum (one-hot MXU landing)
#
# Replaces XLA's scatter-add for the backward gather transpose
# d_x[n] = sum over edges e with sender n of d_xg[e]. Profiling showed the
# five per-layer [E, d] f32 scatter-adds at 37% of the train step; with
# edges pre-sorted by SENDER (a second host-side prepare_csr_tiles pass),
# each edge tile lands into its node block with one bf16 one-hot matmul.
# ---------------------------------------------------------------------------

def _segsum_kernel(tile_blocks_ref, data_ref, seg_ref, o_ref, *,
                   node_block: int, edge_tile: int):
    t = pl.program_id(0)
    blk = tile_blocks_ref[t]
    is_first_tile_of_block = jnp.logical_or(
        t == 0, tile_blocks_ref[jnp.maximum(t - 1, 0)] != blk)

    @pl.when(is_first_tile_of_block)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    local2d = seg_ref[pl.ds(t, 1), :] - blk * node_block       # [1, TE]
    rows = jax.lax.broadcasted_iota(jnp.int32, (node_block, edge_tile), 0)
    # padding slots carry segment -1 → negative local id → match no row
    eq = (rows == jnp.broadcast_to(local2d, (node_block, edge_tile))
          ).astype(data_ref.dtype)                             # [TN, TE]
    # f32 data must not ride the 1-pass default (see _SEL_PRECISION);
    # bf16 data stays native-exact on the bf16 MXU
    prec = _SEL_PRECISION if data_ref.dtype == jnp.float32 else None
    o_ref[:] += jnp.dot(eq, data_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=prec)


@functools.partial(jax.jit,
                   static_argnames=("num_nodes", "node_block", "edge_tile",
                                    "interpret"))
def pallas_segment_sum_csr(data: jnp.ndarray, padded_seg: jnp.ndarray,
                           tile_blocks: jnp.ndarray, num_nodes: int,
                           node_block: int = 256, edge_tile: int = 256,
                           interpret: Optional[bool] = None) -> jnp.ndarray:
    """out[n] = sum of data rows whose segment id is n (f32).

    `data` must be pre-permuted into segment-sorted CSR-tile order
    (prepare_csr_tiles on the segment ids); `padded_seg` carries -1 for
    padding slots. bf16 data rides the MXU at full rate; accumulation is f32.
    """
    if interpret is None:
        interpret = _interpret_default()
    e_pad, d = data.shape
    t = e_pad // edge_tile
    nb_pad = -(-num_nodes // node_block) * node_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((edge_tile, d), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, edge_tile), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, d), lambda i, tb: (tb[i], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, node_block=node_block,
                          edge_tile=edge_tile),
        out_shape=jax.ShapeDtypeStruct((nb_pad, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_blocks, data,
      padded_seg.astype(jnp.int32).reshape(t, edge_tile))
    return out[:num_nodes]


def pallas_segment_sum_csr_reference(data, padded_seg, num_nodes):
    """jnp reference: masked segment sum over the padded CSR layout."""
    mask = padded_seg >= 0
    seg = jnp.where(mask, padded_seg, 0)
    contrib = jnp.where(mask[:, None], data.astype(jnp.float32), 0.0)
    return jax.ops.segment_sum(contrib, seg, num_segments=num_nodes)


# ---------------------------------------------------------------------------
# fused hoisted aggregation v2 (profile-guided redesign)
#
# Changes vs make_fused_hoisted_aggregate_pallas_bwd (docs/RESULTS.md):
#   * the sender projection x@W_s moves INSIDE the kernels — the E-wide
#     gather shrinks from message width H (464) to node width d_in (224),
#     and the backward scatter-add shrinks from [E, H] f32 to [E, d_in]
#     bf16 (4.1x less HBM traffic on the step's hottest op),
#   * dW_s accumulates in-kernel as x_gᵀ @ d_op (no d_y_s materialization),
#   * forward segment max runs a ONE-directional segmented cummax
#     (Hillis–Steele log-roll; receivers sorted within a tile) and lands
#     rows via the last-slot one-hot matmul — half the VPU passes of the
#     bidirectional variant.
# ---------------------------------------------------------------------------

def _fused_fwd_kernel_v2(tile_blocks_ref, xg_ref, ws_ref, e_ref, we_ref,
                         recv_ref, o_ref, *, node_block: int, edge_tile: int):
    t = pl.program_id(0)
    blk = tile_blocks_ref[t]
    is_first_tile_of_block = jnp.logical_or(
        t == 0, tile_blocks_ref[jnp.maximum(t - 1, 0)] != blk)

    @pl.when(is_first_tile_of_block)
    def _():
        o_ref[:] = jnp.full_like(o_ref, _NEG)

    m = jnp.dot(xg_ref[:], ws_ref[:], preferred_element_type=jnp.float32) \
        + jnp.dot(e_ref[:], we_ref[:], preferred_element_type=jnp.float32)

    local2d = (recv_ref[pl.ds(t, 1), :] - blk * node_block)    # [1, TE]

    # one-directional segmented inclusive cummax: receivers are sorted
    # within the tile, so equality-gated forward log-rolls leave the LAST
    # slot of every segment run holding the run's max. Circular wraparound
    # is self-correct: sortedness makes a wrapped id match only when the
    # whole tile is one segment, where merging is harmless.
    # (Measured dead ends, docs/RESULTS.md: branching later rolls off via
    # per-tile pl.when + VMEM scratch ran 64% SLOWER — scratch roundtrips
    # beat the saved rolls; keep the register-resident static unroll.)
    # column-oriented segment ids make each pass a select (2 VPU passes,
    # no per-shift transpose relayout) — same change as the v3 kernel
    localc = jnp.transpose(local2d)                            # [TE, 1]
    r = m
    shift = 1
    while shift < edge_tile:
        match = pltpu.roll(localc, shift, axis=0) == localc
        r_roll = pltpu.roll(r, shift, axis=0)
        r = jnp.where(match, jnp.maximum(r, r_roll), r)
        shift *= 2

    # land each segment's last slot with a one-hot MXU matmul
    nxt = pltpu.roll(local2d, edge_tile - 1, axis=1)           # local[i+1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, edge_tile), 1)
    is_last = jnp.logical_or(local2d != nxt,
                             col == edge_tile - 1).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (node_block, edge_tile), 0)
    eq = (rows == jnp.broadcast_to(local2d, (node_block, edge_tile))
          ).astype(jnp.float32) * is_last                      # [TN, TE]
    sums = jnp.dot(eq, r, preferred_element_type=jnp.float32,
                   precision=_SEL_PRECISION)                   # [TN, H]
    has = jnp.sum(eq, axis=1, keepdims=True)                   # 0 or 1
    out_tile = sums + (has - 1.0) * (-_NEG)
    o_ref[:] = jnp.maximum(o_ref[:], out_tile)


def _fused_fwd_call_v2(x_g, w_s, e_t, w_e, padded_receivers, tile_blocks,
                       num_nodes, node_block, edge_tile, interpret):
    e_pad, d_in = x_g.shape
    h = w_s.shape[1]
    de = e_t.shape[1]
    t = e_pad // edge_tile
    nb_pad = -(-num_nodes // node_block) * node_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((edge_tile, d_in), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, de), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((de, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, edge_tile), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, h), lambda i, tb: (tb[i], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_fused_fwd_kernel_v2, node_block=node_block,
                          edge_tile=edge_tile),
        out_shape=jax.ShapeDtypeStruct((nb_pad, h), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_blocks, x_g, w_s, e_t, w_e,
      padded_receivers.astype(jnp.int32).reshape(t, edge_tile))
    return out[:num_nodes]


def _fused_bwd_kernel_v2(tile_blocks_ref, xg_ref, ws_ref, e_ref, we_ref,
                         recv_ref, inner_ref, g_ref,
                         dxg_ref, de_ref, dws_ref, dwe_ref,
                         *, node_block: int, edge_tile: int):
    """Backward of v2 under the same CSR tiling: recompute the operand,
    route upstream grads to edges at their segment max via one-hot MXU
    matmuls, and emit the SENDER-width gradient d_xg = d_op @ W_sᵀ (bf16)
    plus in-kernel W_s / W_e gradient accumulators — d_op never reaches HBM.
    """
    t = pl.program_id(0)
    blk = tile_blocks_ref[t]

    @pl.when(t == 0)
    def _():
        dws_ref[:] = jnp.zeros_like(dws_ref)
        dwe_ref[:] = jnp.zeros_like(dwe_ref)

    operand = jnp.dot(xg_ref[:], ws_ref[:],
                      preferred_element_type=jnp.float32) \
        + jnp.dot(e_ref[:], we_ref[:], preferred_element_type=jnp.float32)

    local2d = recv_ref[pl.ds(t, 1), :] - blk * node_block      # [1, TE]
    rows = jax.lax.broadcasted_iota(jnp.int32, (node_block, edge_tile), 0)
    eq = (rows == jnp.broadcast_to(local2d, (node_block, edge_tile))
          ).astype(jnp.float32)                                # [TN, TE]
    # (The r1 "f32 one-hot matmuls beat bf16 casts by 15%" measurement is
    # explained by the default f32 dot actually running ONE bf16 pass —
    # which also bf16-rounded the gathered inner and broke this strict
    # 1e-5 routing on chip. _SEL_PRECISION restores exact f32 selection.)
    inner_at_e = jnp.dot(eq.T, inner_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=_SEL_PRECISION)             # [TE, H]
    g_at_e = jnp.dot(eq.T, g_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=_SEL_PRECISION)                 # [TE, H]
    has_recv = jnp.sum(eq, axis=0)[:, None]                    # [TE, 1]
    sel = (jnp.abs(operand - inner_at_e)
           <= 1e-5 * jnp.abs(inner_at_e) + 1e-5).astype(jnp.float32)
    d_op = sel * has_recv * g_at_e                             # [TE, H]

    d_op_c = d_op.astype(dxg_ref.dtype)
    dxg_ref[:] = jnp.dot(d_op_c, ws_ref[:].T,
                         preferred_element_type=jnp.float32
                         ).astype(dxg_ref.dtype)
    de_ref[:] = jnp.dot(d_op, we_ref[:].T,
                        preferred_element_type=jnp.float32)
    dws_ref[:] += jnp.dot(xg_ref[:].T, d_op_c,
                          preferred_element_type=jnp.float32)
    dwe_ref[:] += jnp.dot(e_ref[:].T, d_op,
                          preferred_element_type=jnp.float32)


def _fused_bwd_call_v2(x_g, w_s, e_t, w_e, padded_receivers, tile_blocks,
                       inner, g, num_nodes, node_block, edge_tile, interpret,
                       grad_dtype):
    e_pad, d_in = x_g.shape
    h = w_s.shape[1]
    de = e_t.shape[1]
    t = e_pad // edge_tile
    nb_pad = -(-num_nodes // node_block) * node_block
    inner_p = jnp.pad(inner, ((0, nb_pad - num_nodes), (0, 0)))
    g_p = jnp.pad(g, ((0, nb_pad - num_nodes), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((edge_tile, d_in), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, de), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((de, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, edge_tile), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, h), lambda i, tb: (tb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, h), lambda i, tb: (tb[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((edge_tile, d_in), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, de), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((de, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    d_xg, d_e, d_ws, d_we = pl.pallas_call(
        functools.partial(_fused_bwd_kernel_v2, node_block=node_block,
                          edge_tile=edge_tile),
        out_shape=(
            jax.ShapeDtypeStruct((e_pad, d_in), grad_dtype),
            jax.ShapeDtypeStruct((e_pad, de), jnp.float32),
            jax.ShapeDtypeStruct((d_in, h), jnp.float32),
            jax.ShapeDtypeStruct((de, h), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_blocks, x_g, w_s, e_t, w_e,
      padded_receivers.astype(jnp.int32).reshape(t, edge_tile),
      inner_p, g_p)
    return d_xg, d_e, d_ws, d_we


def make_fused_hoisted_aggregate_v2(num_nodes: int, node_block: int = 256,
                                    edge_tile: int = 256,
                                    interpret: Optional[bool] = None):
    """Fused hoisted max-aggregation, sender projection inside the kernels.

    fused(x, w_s, e_t, w_e, senders_t, padded_recv, tile_blocks, offset,
          ssum_perm, ssum_seg, ssum_blocks):
      inner[n] = max over tiled edges with receiver n of
                 (x[senders_t] @ w_s + e_t @ w_e)
      out[n]   = offset[n] + inner[n] for non-empty n, else 0.

    The E-wide gather runs at node width d_in (bf16) and the backward
    scatter-add at d_in bf16 — the two ops that dominate the train step.
    The last three args are the optional SENDER-sorted CSR tiling
    (prepare_csr_tiles over senders_t): when given, the backward gather
    transpose d_x = Σ_e d_xg[e] runs as a bf16 gather + one-hot MXU landing
    (pallas_segment_sum_csr) instead of an XLA f32 scatter-add — profiled at
    ~5x faster at flagship scale. Pass None for all three to fall back.
    """
    if interpret is None:
        interpret = _interpret_default()
    gather_dtype = jnp.bfloat16 if not interpret else jnp.float32

    def _prep(x, w_s, e_t, w_e, senders_t):
        x_g = x.astype(gather_dtype)[senders_t]
        return (x_g, w_s.astype(gather_dtype), e_t,
                w_e.astype(jnp.float32))

    @jax.custom_vjp
    def fused(x, w_s, e_t, w_e, senders_t, padded_recv, tile_blocks, offset,
              ssum_perm, ssum_seg, ssum_blocks):
        x_g, ws_c, e_c, we_c = _prep(x, w_s, e_t, w_e, senders_t)
        inner = _fused_fwd_call_v2(
            x_g, ws_c, e_c, we_c, padded_recv, tile_blocks,
            num_nodes, node_block, edge_tile, interpret)
        has = inner > _NEG / 2
        return jnp.where(has, offset + inner, 0.0)

    def fwd(x, w_s, e_t, w_e, senders_t, padded_recv, tile_blocks, offset,
            ssum_perm, ssum_seg, ssum_blocks):
        x_g, ws_c, e_c, we_c = _prep(x, w_s, e_t, w_e, senders_t)
        inner = _fused_fwd_call_v2(
            x_g, ws_c, e_c, we_c, padded_recv, tile_blocks,
            num_nodes, node_block, edge_tile, interpret)
        has = inner > _NEG / 2
        out = jnp.where(has, offset + inner, 0.0)
        return out, (x, w_s, e_t, w_e, senders_t, padded_recv, tile_blocks,
                     inner, has, ssum_perm, ssum_seg, ssum_blocks)

    def bwd(res, g):
        (x, w_s, e_t, w_e, senders_t, padded_recv, tile_blocks, inner,
         has, ssum_perm, ssum_seg, ssum_blocks) = res
        g_pass = jnp.where(has, g, 0.0)
        inner_z = jnp.where(has, inner, 0.0)
        x_g, ws_c, e_c, we_c = _prep(x, w_s, e_t, w_e, senders_t)
        d_xg, d_e, d_ws, d_we = _fused_bwd_call_v2(
            x_g, ws_c, e_c, we_c, padded_recv, tile_blocks, inner_z, g_pass,
            num_nodes, node_block, edge_tile, interpret, gather_dtype)
        if ssum_perm is None:
            d_x = jax.ops.segment_sum(d_xg.astype(jnp.float32), senders_t,
                                      num_segments=x.shape[0])
        else:
            d_x = pallas_segment_sum_csr(
                d_xg[ssum_perm], ssum_seg, ssum_blocks, x.shape[0],
                node_block, edge_tile, interpret)
        return (d_x, d_ws, d_e, d_we, None, None, None, g_pass,
                None, None, None)

    fused.defvjp(fwd, bwd)
    return fused


def fused_hoisted_aggregate_v2_reference(x, w_s, e_t, w_e, senders_t,
                                         padded_recv, offset, num_nodes):
    """jnp reference with identical semantics for testing."""
    mask = padded_recv >= 0
    recv_c = jnp.where(mask, padded_recv, 0)
    operand = x[senders_t] @ w_s + e_t @ w_e
    from radargnn_tpu.ops.segment import segment_count

    filled = jnp.where(mask[:, None], operand, -jnp.inf)
    inner = jax.ops.segment_max(filled, recv_c, num_segments=num_nodes)
    # padding slots all carry receiver 0 when clamped; subtract their count
    has = segment_count(recv_c, num_nodes, mask) > 0
    return jnp.where(has[:, None], offset + inner, 0.0)


# ---------------------------------------------------------------------------
# fused hoisted aggregation v3 — windowed kernels (no XLA gathers/scatters)
#
# Requires Morton-ordered nodes + prepare_windowed_csr_tiles: every receiver
# block's senders sit inside a window of `window_blocks` consecutive node
# blocks, so
#   * the forward E-wide gather x[senders] becomes an in-kernel one-hot MXU
#     matmul against the VMEM-resident window (eq_s @ x_window),
#   * the backward gather transpose d_x lands in-kernel into per-part window
#     outputs (eq_s.T @ d_xg) — the [E, d] HBM crossing (profiled at
#     5.7 ms/layer as either scatter-add or permutation gather) disappears.
# The few percent of edges whose sender misses the window ride a small
# fixed-budget XLA overflow path.
# ---------------------------------------------------------------------------

def _exact_sel_dot(eq01, data):
    """Exact-f32 SELECTION dot `eq01 @ data` for a 0/1 matrix with at most
    ONE hit per output row, in THREE native bf16 MXU passes (r5).

    Why: Mosaic's default f32 dot runs one bf16 pass (rounds the selected
    values — the r4 precision bug), and Precision.HIGHEST splits BOTH
    operands (6 passes). A 0/1 one-hot is bf16-exact, so only the data
    needs splitting: h1 = bf16(d), h2 = bf16(d - h1), h3 = d - h1 - h2
    (each split exact by the Dekker argument; 3×8 mantissa bits cover
    f32's 24, and the selected parts recombine exactly because their sum
    IS the representable f32 value). Measured on the windowed strict path:
    the landing + inner-gather HIGHEST dots were the r4 strict-routing
    cost (5.85M vs 9.9M bf16_max)."""
    h1 = data.astype(jnp.bfloat16)
    r1 = data - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    eqb = eq01.astype(jnp.bfloat16)
    # summation ORDER carries the exactness: h2+h3 = r1 exactly (h3 IS
    # r1−h2, an f32), then h1+r1 = d exactly. The left-to-right order
    # (h1+h2)+h3 is off by 1 ulp when d−h3 needs 25 mantissa bits
    # (caught by tests/test_pallas.py::test_exact_split_decomposition).
    return (jnp.dot(eqb, h1, preferred_element_type=jnp.float32)
            + (jnp.dot(eqb, h2, preferred_element_type=jnp.float32)
               + jnp.dot(eqb, h3, preferred_element_type=jnp.float32)))


def _window_eq(sloc_row, edge_tile, width, dtype):
    """One-hot [TE, W] edge->window-slot matrix; -1 slots match nothing."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (edge_tile, width), 1)
    return (cols == jnp.transpose(sloc_row)).astype(dtype)


def _fused_fwd_kernel_v3(tile_blocks_ref, tile_win_ref, *refs,
                         node_block: int, edge_tile: int, window_blocks: int,
                         roll_limit: int, save_xg: bool,
                         save_m: bool = False, precomp_eq: bool = False,
                         bf16_landing: bool = False,
                         precomp_land: bool = False):
    i = window_blocks
    x_parts = refs[:i]
    ws_ref, e_ref, we_ref, recv_ref, sloc_ref = refs[i:i + 5]
    i += 5
    eqs_ref = None
    if precomp_eq:
        eqs_ref = refs[i]
        i += 1
    eql_ref = None
    if precomp_land:
        eql_ref = refs[i]
        i += 1
    o_ref = refs[i]
    i += 1
    t = pl.program_id(0)
    blk = tile_blocks_ref[t]
    is_first_tile_of_block = jnp.logical_or(
        t == 0, tile_blocks_ref[jnp.maximum(t - 1, 0)] != blk)

    @pl.when(is_first_tile_of_block)
    def _():
        o_ref[:] = jnp.full_like(o_ref, _NEG)

    # NOTE (measured): gating this gather per window part with lax.cond on
    # a host bitmask (skip empty parts' one-hot build + dot) was 12% SLOWER
    # end-to-end — Mosaic branch overhead + losing the single wide MXU dot
    # swamp the ~32% skippable work. Keep the ungated wide one-hot matmul.
    xw = jnp.concatenate([p[:] for p in x_parts], axis=0)     # [W, d_in]
    sloc2d = sloc_ref[pl.ds(t, 1), :]                          # [1, TE]
    if precomp_eq:
        # layer-independent one-hot streamed from HBM (built ONCE per step
        # in XLA from sloc; serves all conv layers fwd+bwd) — the in-kernel
        # iota/compare/cast build sat on the VPU critical path of every
        # layer while the stream rides overlapped DMA
        eq_s = eqs_ref[:]
    else:
        eq_s = _window_eq(sloc2d, edge_tile, xw.shape[0], xw.dtype)
    x_g = jnp.dot(eq_s, xw,
                  preferred_element_type=jnp.float32).astype(xw.dtype)
    if save_xg:
        # stream the gathered sender rows to HBM so the backward kernel
        # skips the window one-hot re-gather entirely
        refs[i][:] = x_g
        i += 1
    m = jnp.dot(x_g, ws_ref[:], preferred_element_type=jnp.float32) \
        + jnp.dot(e_ref[:], we_ref[:], preferred_element_type=jnp.float32)
    if save_m:
        # stream bf16(m) so the backward skips the operand recompute; only
        # meaningful under bf16_max routing (sel compares in bf16 anyway)
        refs[i][:] = m.astype(refs[i].dtype)
        i += 1

    local2d = (recv_ref[pl.ds(t, 1), :] - blk * node_block)    # [1, TE]
    # segmented suffix-max via log-rolls; column-oriented segment ids make
    # each pass a select (2 VPU passes, no per-shift transpose relayout).
    # With spread (run_cap=1) tiling roll_limit is 1 and the loop vanishes:
    # the landing one-hot dot + cross-tile o_ref max do the whole reduce.
    r = m
    if roll_limit > 1:
        localc = jnp.transpose(local2d)                        # [TE, 1]
        shift = 1
        while shift < roll_limit:
            match = pltpu.roll(localc, shift, axis=0) == localc  # [TE, 1]
            r_roll = pltpu.roll(r, shift, axis=0)
            r = jnp.where(match, jnp.maximum(r, r_roll), r)
            shift *= 2

    if precomp_land:
        # layer-independent landing one-hot (is_last folded) streamed from
        # HBM — built once per step in XLA from the recv table
        eq = eql_ref[0]
        sums = jnp.dot(eq, r.astype(eq.dtype),
                       preferred_element_type=jnp.float32)
        has = jnp.sum(eq, axis=1, keepdims=True).astype(jnp.float32)
    else:
        nxt = pltpu.roll(local2d, edge_tile - 1, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, edge_tile), 1)
        is_last = jnp.logical_or(local2d != nxt, col == edge_tile - 1)
        rows = jax.lax.broadcasted_iota(jnp.int32,
                                        (node_block, edge_tile), 0)
        eqb = jnp.logical_and(
            rows == jnp.broadcast_to(local2d, (node_block, edge_tile)),
            jnp.broadcast_to(is_last, (node_block, edge_tile)))
        if bf16_landing:
            # bf16 landing: the one-hot selects single values, so landing
            # in bf16 rounds the MAXIMA to bf16 (requires bf16_max backward
            # routing) but halves the landing matmul. Measured NEUTRAL when
            # the roll loop dominated the VPU (docs/RESULTS.md); re-tested
            # under spread tiling where only 2 roll passes remain.
            eq = eqb.astype(jnp.bfloat16)
            sums = jnp.dot(eq, r.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            # at most one slot per row is set (is_last) — 0/1 exact
            has = jnp.sum(eq, axis=1, keepdims=True).astype(jnp.float32)
        else:
            # f32 landing must select exactly (strict routing compares the
            # recomputed f32 operand against these landed maxima at 1e-5);
            # 3-part bf16 split = exact selection at half HIGHEST's passes
            sums = _exact_sel_dot(eqb, r)
            # at most one slot per row is set (is_last) — bf16-exact sum
            has = jnp.sum(eqb.astype(jnp.bfloat16), axis=1,
                          keepdims=True).astype(jnp.float32)
    out_tile = sums + (has - 1.0) * (-_NEG)
    o_ref[:] = jnp.maximum(o_ref[:], out_tile)


def _fused_bwd_kernel_v3(tile_blocks_ref, tile_win_ref, *refs,
                         node_block: int, edge_tile: int, window_blocks: int,
                         bf16_cmp: bool = False, use_m_stream: bool = False,
                         sender_dx: bool = False, precomp_eq: bool = False,
                         precomp_land: bool = False,
                         precomp_eqT: bool = False,
                         grad_dtype=jnp.bfloat16):
    wb = window_blocks
    i = 0
    if use_m_stream:
        m_ref = refs[i]                # [TE, H] bf16(m) from the forward
        xg_ref = None
    else:
        m_ref = None
        xg_ref = refs[i]
    i += 1
    (ws_ref, e_ref, we_ref, recv_ref, sloc_ref, inner_ref,
     g_ref) = refs[i:i + 7]
    i += 7
    eqs_ref = None
    if precomp_eq:
        eqs_ref = refs[i]
        i += 1
    eqt_ref = None
    if precomp_land:
        eqt_ref = refs[i]
        i += 1
    eqsT_ref = None
    if precomp_eqT:
        eqsT_ref = refs[i]
        i += 1
    de_ref = refs[i]
    i += 1
    dws_ref = None
    if not sender_dx:
        dws_ref = refs[i]
        i += 1
    dwe_ref = refs[i]
    i += 1
    dx_parts = refs[i:i + wb]

    t = pl.program_id(0)
    blk = tile_blocks_ref[t]

    @pl.when(t == 0)
    def _():
        if dws_ref is not None:
            dws_ref[:] = jnp.zeros_like(dws_ref)
        dwe_ref[:] = jnp.zeros_like(dwe_ref)

    # window moved -> all parts look at fresh blocks (tile_win is monotone,
    # so a part never returns to an already-written block)
    win_changed = jnp.logical_or(
        t == 0, tile_win_ref[jnp.maximum(t - 1, 0)] != tile_win_ref[t])

    @pl.when(win_changed)
    def _():
        for dxp in dx_parts:
            dxp[:] = jnp.zeros_like(dxp)

    cd = grad_dtype
    w_width = wb * node_block
    sloc2d = sloc_ref[pl.ds(t, 1), :]
    if precomp_eqT:
        # pre-transposed [W, TE] stream: the dx landing consumes it
        # directly — no in-kernel eq build OR transpose
        eq_sT = eqsT_ref[0]
        eq_s = None
    elif precomp_eq:
        eq_s = eqs_ref[:]                                      # [TE, W]
        eq_sT = eq_s.T
    else:
        eq_s = _window_eq(sloc2d, edge_tile, w_width, cd)
        eq_sT = eq_s.T
    if use_m_stream:
        # bf16(m) streamed from the forward: no operand recompute, and the
        # bf16 routing equality compares exactly the same values the
        # recompute-then-round path would
        x_g = None
        operand = m_ref[:].astype(jnp.float32)     # exactly-bf16 values
    else:
        # x_g streamed from the forward kernel (no window re-gather);
        # recompute the message EXACTLY as the forward did (same tile
        # shapes, deterministic MXU accumulation) so sel matches the
        # landed maxima
        x_g = xg_ref[:]                                        # [TE, d_in]
        operand = jnp.dot(x_g, ws_ref[:],
                          preferred_element_type=jnp.float32) \
            + jnp.dot(e_ref[:], we_ref[:],
                      preferred_element_type=jnp.float32)

    local2d = recv_ref[pl.ds(t, 1), :] - blk * node_block
    if bf16_cmp:
        # inner_ref holds bf16(inner) (cast once outside; the forward max
        # stays exact f32). Gather it with a bf16 one-hot (exact selection,
        # bf16 MXU rate — this gather was 28% of the backward's MXU work in
        # f32) and route gradients by exact bf16 equality: inner IS the
        # argmax edge's operand, so bf16(op) == bf16(inner) at the argmax;
        # edges within bf16 rounding of the max share the gradient (a valid
        # subgradient; f32 tie semantics broadened to bf16 resolution).
        if precomp_land:
            eq_t_c = eqt_ref[0]          # layer-independent, streamed
        else:
            ncols = jax.lax.broadcasted_iota(jnp.int32,
                                             (edge_tile, node_block), 1)
            eq_t_c = (ncols == jnp.transpose(local2d)).astype(cd)
        inner_at_e = jnp.dot(eq_t_c, inner_ref[:].astype(eq_t_c.dtype),
                             preferred_element_type=jnp.float32)
        has_recv = (jnp.transpose(local2d) >= 0).astype(jnp.float32)
        # Mosaic has no bf16 vector compare — round the operand to bf16 and
        # compare in f32 (inner_at_e already holds exactly-bf16 values in
        # f32, so f32 equality is exact bf16 equality); the streamed m is
        # already exactly-bf16, no rounding pass needed
        op16 = operand if use_m_stream \
            else operand.astype(jnp.bfloat16).astype(jnp.float32)
        sel = (op16 == inner_at_e).astype(jnp.float32)
    else:
        # strict routing: gather each edge's landed max EXACTLY via the
        # 3-part bf16 split (r5 — replaces the HIGHEST dot that made the
        # post-fix strict path 5.85M vs 9.9M bf16_max). Built transposed
        # directly from iota (no relayout); gradients tolerate bf16 for
        # the g gather below.
        ncols = jax.lax.broadcasted_iota(jnp.int32,
                                         (edge_tile, node_block), 1)
        eq_t_c = (ncols == jnp.transpose(local2d)).astype(cd)
        inner_at_e = _exact_sel_dot(eq_t_c, inner_ref[:])
        # a valid slot's local receiver lies in [0, node_block); dead
        # slots carry a negative local id — same predicate the one-hot
        # column-sum computed, without materializing the [TN, TE] eq
        has_recv = (jnp.transpose(local2d) >= 0).astype(jnp.float32)
        sel = (jnp.abs(operand - inner_at_e)
               <= 1e-5 * jnp.abs(inner_at_e) + 1e-5).astype(jnp.float32)
    g_at_e = jnp.dot(eq_t_c, g_ref[:].astype(eq_t_c.dtype),
                     preferred_element_type=jnp.float32)
    d_op = sel * has_recv * g_at_e                             # [TE, H]

    d_op_c = d_op.astype(cd)
    de_ref[:] = jnp.dot(d_op_c, we_ref[:].T,
                        preferred_element_type=jnp.float32
                        ).astype(de_ref.dtype)
    dwe_ref[:] += jnp.dot(e_ref[:].T, d_op_c,
                          preferred_element_type=jnp.float32)

    # NOTE (measured): gating this landing per window part with pl.when
    # (skipping empty parts' one-hot + dot) was ~2% slower, and gating the
    # forward gather with lax.cond 12% slower — one wide one-hot MXU dot
    # beats any per-part split despite ~32% of part-dots being empty.
    if sender_dx:
        # sender-space landing: d_ys[w] = Σ_{e: slot w} d_op[e] at message
        # width H; d_x = d_ys_node @ W_sᵀ and dW_s = xᵀ @ d_ys_node become
        # node-wide XLA matmuls outside the kernel — removes the d_xg
        # projection, the in-kernel dW_s, and (with the m stream) every use
        # of x_g from the backward
        dys = jnp.dot(eq_sT, d_op_c,
                      preferred_element_type=jnp.float32)      # [W, H]
        for j, dxp in enumerate(dx_parts):
            dxp[:] += dys[j * node_block:(j + 1) * node_block]
    else:
        d_xg = jnp.dot(d_op_c, ws_ref[:].T,
                       preferred_element_type=jnp.float32)     # [TE, d_in]
        dws_ref[:] += jnp.dot(x_g.T, d_op_c,
                              preferred_element_type=jnp.float32)
        dxw = jnp.dot(eq_sT, d_xg.astype(cd),
                      preferred_element_type=jnp.float32)      # [W, d_in]
        for j, dxp in enumerate(dx_parts):
            dxp[:] += dxw[j * node_block:(j + 1) * node_block]


def _v3_common_specs(d_in, h, de, t, edge_tile, node_block, window_blocks,
                     nblocks_pad):
    """x-part specs (window columns, clamped) + weight/edge/table specs."""
    def part_map(j):
        return lambda i, tb, tw: (jnp.minimum(tw[i] + j, nblocks_pad - 1), 0)

    specs = [pl.BlockSpec((node_block, d_in), part_map(j),
                          memory_space=pltpu.VMEM)
             for j in range(window_blocks)]
    specs += [
        pl.BlockSpec((d_in, h), lambda i, tb, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((edge_tile, de), lambda i, tb, tw: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((de, h), lambda i, tb, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, edge_tile), lambda i, tb, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, edge_tile), lambda i, tb, tw: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return specs


def _fused_fwd_call_v3(x_c, w_s, e_t, w_e, padded_recv, senders_local,
                       tile_blocks, tile_win, num_nodes, node_block,
                       edge_tile, window_blocks, interpret,
                       roll_limit=None, save_xg=False, save_m=False,
                       eq_m=None, bf16_landing=False, eq_land=None):
    n_pad_in, d_in = x_c.shape
    h = w_s.shape[1]
    de = e_t.shape[1]
    e_pad = e_t.shape[0]
    t = e_pad // edge_tile
    w_width = window_blocks * node_block
    nb_pad = -(-num_nodes // node_block) * node_block
    nblocks_pad = nb_pad // node_block
    xp = jnp.pad(x_c, ((0, nb_pad - n_pad_in), (0, 0)))

    in_specs = _v3_common_specs(d_in, h, de, t, edge_tile, node_block,
                                window_blocks, nblocks_pad)
    inputs = [tile_blocks, tile_win, *([xp] * window_blocks), w_s, e_t, w_e,
              padded_recv.astype(jnp.int32).reshape(t, edge_tile),
              senders_local.astype(jnp.int32).reshape(t, edge_tile)]
    if eq_m is not None:
        in_specs.append(pl.BlockSpec((edge_tile, w_width),
                                     lambda i, tb, tw: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(eq_m)
    if eq_land is not None:
        in_specs.append(pl.BlockSpec((1, node_block, edge_tile),
                                     lambda i, tb, tw: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(eq_land)
    out_specs = [pl.BlockSpec((node_block, h),
                              lambda i, tb, tw: (tb[i], 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((nb_pad, h), jnp.float32)]
    if save_xg:
        out_specs.append(pl.BlockSpec((edge_tile, d_in),
                                      lambda i, tb, tw: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((e_pad, d_in), x_c.dtype))
    if save_m:
        # always bf16: the stream IS the bf16 rounding the backward's
        # routing equality compares against (also in interpret mode)
        out_specs.append(pl.BlockSpec((edge_tile, h),
                                      lambda i, tb, tw: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((e_pad, h), jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
    )
    out = pl.pallas_call(
        functools.partial(_fused_fwd_kernel_v3, node_block=node_block,
                          edge_tile=edge_tile, window_blocks=window_blocks,
                          roll_limit=roll_limit or edge_tile,
                          save_xg=save_xg, save_m=save_m,
                          precomp_eq=eq_m is not None,
                          bf16_landing=bf16_landing,
                          precomp_land=eq_land is not None),
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    if len(out_shape) == 1:
        return (out[:num_nodes],)
    return (out[0][:num_nodes],) + tuple(out[1:])


def _fused_bwd_call_v3(data_stream, w_s, e_t, w_e, padded_recv,
                       senders_local, tile_blocks, tile_win, inner, g,
                       num_nodes, node_block, edge_tile, window_blocks,
                       interpret, bf16_cmp=False, use_m_stream=False,
                       sender_dx=False, eq_m=None, eq_t=None, eq_mT=None):
    """`data_stream` is the forward's xg stream (default) or its bf16 m
    stream (`use_m_stream`). With `sender_dx` the per-part outputs hold the
    H-wide sender-space sums d_ys and there is no in-kernel dW_s."""
    d_in = w_s.shape[0]
    h = w_s.shape[1]
    de = e_t.shape[1]
    e_pad = e_t.shape[0]
    t = e_pad // edge_tile
    w_width = window_blocks * node_block
    nb_pad = -(-num_nodes // node_block) * node_block
    nblocks_pad = nb_pad // node_block
    inner_p = jnp.pad(inner, ((0, nb_pad - num_nodes), (0, 0)))
    if bf16_cmp:
        # inner holds bf16-rounded maxima; shipping it bf16 halves the
        # per-tile VMEM fetch and the in-kernel gather rides the bf16 MXU
        inner_p = inner_p.astype(jnp.bfloat16)
    g_p = jnp.pad(g, ((0, nb_pad - num_nodes), (0, 0)))

    stream_w = h if use_m_stream else d_in
    in_specs = [
        pl.BlockSpec((edge_tile, stream_w), lambda i, tb, tw: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d_in, h), lambda i, tb, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((edge_tile, de), lambda i, tb, tw: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((de, h), lambda i, tb, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, edge_tile), lambda i, tb, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, edge_tile), lambda i, tb, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((node_block, h), lambda i, tb, tw: (tb[i], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((node_block, h), lambda i, tb, tw: (tb[i], 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [tile_blocks, tile_win, data_stream, w_s, e_t, w_e,
              padded_recv.astype(jnp.int32).reshape(t, edge_tile),
              senders_local.astype(jnp.int32).reshape(t, edge_tile),
              inner_p, g_p]
    if eq_m is not None:
        in_specs.append(pl.BlockSpec((edge_tile, w_width),
                                     lambda i, tb, tw: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(eq_m)
    if eq_t is not None:
        in_specs.append(pl.BlockSpec((1, edge_tile, node_block),
                                     lambda i, tb, tw: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(eq_t)
    if eq_mT is not None:
        in_specs.append(pl.BlockSpec((1, w_width, edge_tile),
                                     lambda i, tb, tw: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(eq_mT)

    def part_map(j):
        return lambda i, tb, tw: (jnp.minimum(tw[i] + j, nblocks_pad - 1), 0)

    part_w = h if sender_dx else d_in
    out_specs = [
        pl.BlockSpec((edge_tile, de), lambda i, tb, tw: (i, 0),
                     memory_space=pltpu.VMEM)]
    out_shape = [
        # d_e in e_t's own dtype (bf16 when the model pre-casts) — the
        # cotangent dtype must match the primal's
        jax.ShapeDtypeStruct((e_pad, de), e_t.dtype)]
    if not sender_dx:
        out_specs.append(pl.BlockSpec((d_in, h), lambda i, tb, tw: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((d_in, h), jnp.float32))
    out_specs.append(pl.BlockSpec((de, h), lambda i, tb, tw: (0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((de, h), jnp.float32))
    out_specs += [pl.BlockSpec((node_block, part_w), part_map(j),
                               memory_space=pltpu.VMEM)
                  for j in range(window_blocks)]
    out_shape += [jax.ShapeDtypeStruct((nb_pad, part_w), jnp.float32)
                  for _ in range(window_blocks)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(t,), in_specs=in_specs,
        out_specs=tuple(out_specs))
    outs = pl.pallas_call(
        functools.partial(_fused_bwd_kernel_v3, node_block=node_block,
                          edge_tile=edge_tile, window_blocks=window_blocks,
                          bf16_cmp=bf16_cmp, use_m_stream=use_m_stream,
                          sender_dx=sender_dx, precomp_eq=eq_m is not None,
                          precomp_land=eq_t is not None,
                          precomp_eqT=eq_mT is not None,
                          grad_dtype=(jnp.float32 if interpret
                                      else jnp.bfloat16)),
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    if sender_dx:
        d_e, d_we = outs[:2]
        return d_e, None, d_we, outs[2:]
    d_e, d_ws, d_we = outs[:3]
    return d_e, d_ws, d_we, outs[3:]


def make_fused_hoisted_aggregate_v3(num_nodes: int, node_block: int = 256,
                                    edge_tile: int = 256,
                                    window_blocks: int = 4,
                                    interpret: Optional[bool] = None,
                                    roll_passes: Optional[int] = None,
                                    bf16_max: bool = False,
                                    precomp_eq: bool = True,
                                    stream_m: bool = False,
                                    sender_dx: bool = False,
                                    bf16_landing: bool = False,
                                    precomp_land: bool = False,
                                    precomp_eqT: bool = False,
                                    ovf_sorted: bool = True):
    """Windowed fused max-aggregation (see module section comment).

    `ovf_sorted`: the single-chip tilers emit receiver-sorted overflow
    (with -1 padding at each graph's tail), enabling the sorted
    segment_max lowering; the HALO plans' per-shard overflow is NOT
    receiver-sorted in augmented-index space — pass False there.

    fused(x, w_s, e_t, w_e, offset, e_ovf, recv_t, tile_blocks, tile_win,
          senders_local, part_mask, ovf_senders, ovf_receivers)
      inner[n] = max over in-window tiled edges and overflow edges with
                 receiver n of (x[sender] @ w_s + e @ w_e)
      out[n]   = offset[n] + inner[n] for non-empty n, else 0.

    Differentiable args: x, w_s, e_t (tile-ordered edge features), w_e,
    offset, e_ovf (overflow edge features). part_mask [WB, nblocks_pad]
    marks which node blocks each backward dx part actually visited (host
    metadata) — unvisited blocks are dropped with jnp.where, which is safe
    against uninitialized-garbage NaNs where a multiply would not be.

    bf16_max (backward-only): the backward's inner-gather matmul — the
    largest f32 matmul of the MXU-bound backward kernel — rides the bf16
    MXU by gathering bf16(inner), and gradient routing becomes exact bf16
    equality (inner is the argmax operand, so the argmax always matches).
    CAVEAT: every edge whose message rounds to the same bf16 receives the
    FULL cotangent (k ties ⇒ k·g — not a valid subgradient on bf16 ties),
    which is why it is an opt-in. The forward max and outputs stay exact
    f32 unless bf16_landing is also set.

    Profile-guided variants (r3, composable):
      precomp_eq (DEFAULT ON — measured +2.5%, semantics-identical) — the
        [TE, W] window one-hot is layer-independent; build it ONCE per
        step in XLA (CSE'd across layers/directions) and stream it into
        the kernels instead of re-building it on the VPU critical path of
        every layer fwd+bwd.
      stream_m (requires bf16_max + sender_dx) — forward streams bf16(m);
        backward skips the operand-recompute matmuls and never touches x_g.
      sender_dx — backward lands sender-space sums d_ys = eq_sᵀ@d_op
        (width H); d_x = d_ys@W_sᵀ and dW_s = xᵀ@d_ys become node-wide XLA
        matmuls, removing the d_xg projection and in-kernel dW_s.
      bf16_landing (requires bf16_max) — forward lands the maxima in bf16
        (output maxima bf16-rounded; re-test of the "v1" trade now that
        spread tiling shrank the roll loop).
    """
    if interpret is None:
        interpret = _interpret_default()
    gather_dtype = jnp.bfloat16 if not interpret else jnp.float32
    if stream_m and not (bf16_max and sender_dx):
        raise ValueError("stream_m requires bf16_max and sender_dx (the "
                         "streamed bf16 operand only supports bf16 routing "
                         "and provides no x_g for the in-kernel dW_s)")
    if bf16_landing and not bf16_max:
        raise ValueError("bf16_landing requires bf16_max routing")
    if precomp_land and not (bf16_landing and bf16_max):
        raise ValueError("precomp_land streams bf16 one-hots — requires "
                         "bf16_landing (forward) and bf16_max (backward)")
    nb_pad = -(-num_nodes // node_block) * node_block
    w_width = window_blocks * node_block
    # 2**roll_passes bounds the longest same-receiver run inside a tile
    # (host metadata, see graph.batch.roll_passes_bound); 0 passes (spread
    # run_cap=1 tiling) removes the roll loop entirely
    roll_limit = (min(edge_tile, 1 << roll_passes)
                  if roll_passes is not None else None)

    def _eq_m(senders_local):
        if not precomp_eq:
            return None
        # layer-independent [E_pad, W] one-hot, built once per step in XLA
        # (identical across layers/directions → CSE'd to one materialization)
        cols = jnp.arange(w_width, dtype=jnp.int32)
        return (senders_local[:, None] == cols[None, :]).astype(gather_dtype)

    # always bf16 so interpret-mode semantics match the chip (the
    # landing consumes r.astype(eq.dtype))
    def _eq_mT(senders_local):
        """Pre-transposed [T, W, TE] window one-hot for the backward dx
        landing — removes the per-tile transpose of the streamed eq."""
        if not precomp_eqT:
            return None
        sl = senders_local.astype(jnp.int32).reshape(-1, edge_tile)
        cols = jnp.arange(w_width, dtype=jnp.int32)
        return (sl[:, None, :] == cols[None, :, None]).astype(gather_dtype)

    # always bf16 so interpret-mode semantics match the chip (the
    # landing consumes r.astype(eq.dtype))
    land_dtype = jnp.bfloat16

    def _locals(recv_t, tile_blocks):
        rt = recv_t.astype(jnp.int32).reshape(-1, edge_tile)
        return rt - tile_blocks[:, None] * node_block     # [T, TE]

    def _eq_land(recv_t, tile_blocks):
        """Layer-independent forward landing one-hot [T, TN, TE] with the
        is_last fold, built once per step in XLA (CSE'd across layers)."""
        if not precomp_land:
            return None
        local = _locals(recv_t, tile_blocks)
        nxt = jnp.concatenate(
            [local[:, 1:], jnp.full((local.shape[0], 1), -2, jnp.int32)],
            axis=1)
        is_last = local != nxt
        rows = jnp.arange(node_block, dtype=jnp.int32)
        eq = (local[:, None, :] == rows[None, :, None]) \
            & is_last[:, None, :]
        return eq.astype(land_dtype)

    def _eq_t(recv_t, tile_blocks):
        """Layer-independent backward receiver one-hot [T, TE, TN]."""
        if not precomp_land:
            return None
        local = _locals(recv_t, tile_blocks)
        rows = jnp.arange(node_block, dtype=jnp.int32)
        return (local[:, :, None] == rows[None, None, :]).astype(land_dtype)

    def _ovf_operand(x, w_s, e_ovf, w_e, ovf_s, ovf_mask):
        cd = gather_dtype
        # gather the few overflow senders FIRST, then project — [Eo,d]@[d,H]
        # instead of a full [N,d]@[d,H] whose rows are mostly unused
        x_o = x.astype(cd)[ovf_s]
        y_s = jnp.dot(x_o, w_s.astype(cd),
                      preferred_element_type=jnp.float32)
        y_e = jnp.dot(e_ovf.astype(cd), w_e.astype(cd),
                      preferred_element_type=jnp.float32)
        op = y_s + y_e
        return jnp.where(ovf_mask[:, None], op, _NEG)

    def _forward(x, w_s, e_t, w_e, offset, e_ovf, recv_t, tile_blocks,
                 tile_win, senders_local, ovf_s, ovf_r, for_vjp=False):
        if ovf_sorted:
            check_overflow_sorted(ovf_r, "fused windowed aggregate (v3)")
        x_c = x.astype(gather_dtype)
        save_xg = for_vjp and not stream_m
        save_m = for_vjp and stream_m
        eq_m = _eq_m(senders_local)
        res = _fused_fwd_call_v3(
            x_c, w_s.astype(gather_dtype), e_t.astype(gather_dtype),
            w_e.astype(gather_dtype),
            recv_t, senders_local, tile_blocks, tile_win, num_nodes,
            node_block, edge_tile, window_blocks, interpret,
            roll_limit=roll_limit, save_xg=save_xg, save_m=save_m,
            eq_m=eq_m, bf16_landing=bf16_landing,
            eq_land=_eq_land(recv_t, tile_blocks))
        inner_win = res[0]
        stream = res[1] if for_vjp else None
        # overflow receivers arrive sorted per graph with -1 padding at
        # each graph's tail (single-chip tilers); cummax keeps the index
        # vector globally sorted (padding inherits the last valid receiver
        # — its _NEG rows never win a max) so segment_max takes the sorted
        # lowering (+2.9% measured on the dense path, r4)
        ovf_mask = ovf_r >= 0
        if ovf_sorted:
            ovf_r_c = jnp.maximum(
                jax.lax.cummax(jnp.where(ovf_mask, ovf_r, -1)), 0)
        else:
            ovf_r_c = jnp.where(ovf_mask, ovf_r, 0)
        op_o = _ovf_operand(x, w_s, e_ovf, w_e, ovf_s, ovf_mask)
        inner_o = jax.ops.segment_max(op_o, ovf_r_c,
                                      num_segments=num_nodes,
                                      indices_are_sorted=ovf_sorted)
        # segment_max fills empty segments with -inf; combine with window
        inner = jnp.maximum(inner_win, inner_o)
        has = inner > _NEG / 2
        out = jnp.where(has, offset + inner, 0.0)
        return out, inner, has, stream

    @jax.custom_vjp
    def fused(x, w_s, e_t, w_e, offset, e_ovf, recv_t, tile_blocks,
              tile_win, senders_local, part_mask, ovf_s, ovf_r):
        out, _, _, _ = _forward(x, w_s, e_t, w_e, offset, e_ovf, recv_t,
                                tile_blocks, tile_win, senders_local,
                                ovf_s, ovf_r)
        return out

    def fwd(x, w_s, e_t, w_e, offset, e_ovf, recv_t, tile_blocks,
            tile_win, senders_local, part_mask, ovf_s, ovf_r):
        out, inner, has, stream = _forward(
            x, w_s, e_t, w_e, offset, e_ovf, recv_t, tile_blocks, tile_win,
            senders_local, ovf_s, ovf_r, for_vjp=True)
        return out, (x, w_s, e_t, w_e, e_ovf, recv_t, tile_blocks, tile_win,
                     senders_local, part_mask, ovf_s, ovf_r, inner, has,
                     stream)

    def bwd(res, g):
        (x, w_s, e_t, w_e, e_ovf, recv_t, tile_blocks, tile_win,
         senders_local, part_mask, ovf_s, ovf_r, inner, has,
         stream) = res
        g_pass = jnp.where(has, g, 0.0)
        inner_z = jnp.where(has, inner, 0.0)
        d_e_t, d_ws, d_we, parts = _fused_bwd_call_v3(
            stream, w_s.astype(gather_dtype), e_t.astype(gather_dtype),
            w_e.astype(gather_dtype),
            recv_t, senders_local, tile_blocks, tile_win, inner_z, g_pass,
            num_nodes, node_block, edge_tile, window_blocks, interpret,
            bf16_cmp=bf16_max, use_m_stream=stream_m, sender_dx=sender_dx,
            # with the pre-transposed stream the backward never touches the
            # row-major eq — don't ship both
            eq_m=None if precomp_eqT else _eq_m(senders_local),
            eq_t=_eq_t(recv_t, tile_blocks),
            eq_mT=_eq_mT(senders_local))
        d_e_t = d_e_t.astype(e_t.dtype)   # cotangent dtype = primal dtype
        row_masks = jnp.repeat(part_mask, node_block, axis=1)  # [WB, nb_pad]
        part_w = parts[0].shape[1]
        acc = jnp.zeros((nb_pad, part_w), jnp.float32)
        for j, p in enumerate(parts):
            acc = acc + jnp.where(row_masks[j][:, None], p, 0.0)
        if sender_dx:
            # acc holds the sender-space sums d_ys_node [nb_pad, H]; d_x and
            # dW_s are node-wide matmuls (≈1000× fewer MACs than edge-wide)
            d_ys = acc[:x.shape[0]]
            d_x = jnp.dot(d_ys, w_s.T.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
            d_ws = jnp.dot(x.astype(jnp.float32).T, d_ys,
                           preferred_element_type=jnp.float32)
        else:
            d_x = acc[:x.shape[0]]

        # overflow backward (small, XLA)
        ovf_mask = ovf_r >= 0
        ovf_r_c = jnp.where(ovf_mask, ovf_r, 0)
        op_o = _ovf_operand(x, w_s, e_ovf, w_e, ovf_s, ovf_mask)
        if bf16_max:
            sel_o = ovf_mask[:, None] & (
                op_o.astype(jnp.bfloat16)
                == inner_z[ovf_r_c].astype(jnp.bfloat16))
        else:
            sel_o = ovf_mask[:, None] & (
                jnp.abs(op_o - inner_z[ovf_r_c])
                <= 1e-5 * jnp.abs(inner_z[ovf_r_c]) + 1e-5)
        d_op_o = jnp.where(sel_o, g_pass[ovf_r_c], 0.0)
        # NOTE (measured r4): device-argsorting the overflow senders to use
        # the sorted segment_sum lowering here ran 3.9% SLOWER end-to-end
        # (11.03M vs 11.48M) — the per-step argsort + [Eovf, d] gather cost
        # more than the unsorted scatter saves. Keep the plain scatter.
        d_x = d_x + jax.ops.segment_sum(d_op_o @ w_s.T, ovf_s,
                                        num_segments=num_nodes)
        d_ws = d_ws + x[ovf_s].T @ d_op_o
        d_we = d_we + e_ovf.astype(jnp.float32).T @ d_op_o
        d_e_ovf = (d_op_o @ w_e.T).astype(e_ovf.dtype)

        return (d_x, d_ws, d_e_t, d_we, g_pass, d_e_ovf,
                None, None, None, None, None, None, None)

    fused.defvjp(fwd, bwd)
    return fused


def _hoisted_bwd_kernel(tile_blocks_ref, add_ref, e_ref, w_ref, b_ref,
                        recv_ref, inner_ref, g_ref, dop_ref, de_ref, dw_ref,
                        *, node_block: int, edge_tile: int):
    """Backward of the hoisted aggregation under the same CSR tiling.

    Per edge tile: recompute the operand, fetch its node block's maxima and
    upstream grads via one-hot MXU matmuls (no gathers), select edges at the
    max, and emit d_operand / d_e tiles plus a W_e-gradient accumulator.
    """
    t = pl.program_id(0)
    blk = tile_blocks_ref[t]

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    operand = add_ref[:].astype(jnp.float32) \
        + jnp.dot(e_ref[:], w_ref[:],
                  preferred_element_type=jnp.float32) + b_ref[0, :]

    local2d = recv_ref[pl.ds(t, 1), :] - blk * node_block      # [1, TE]
    rows = jax.lax.broadcasted_iota(jnp.int32, (node_block, edge_tile), 0)
    eq = (rows == jnp.broadcast_to(local2d, (node_block, edge_tile))
          ).astype(jnp.float32)                                # [TN, TE]

    inner_at_e = jnp.dot(eq.T, inner_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=_SEL_PRECISION)              # [TE, H]
    g_at_e = jnp.dot(eq.T, g_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=_SEL_PRECISION)                  # [TE, H]
    # rows with no receiver (padding) got 0-rows from the matmuls; their
    # |operand - 0| test could spuriously pass — gate on having a receiver
    has_recv = jnp.sum(eq, axis=0)[:, None]                     # [TE, 1]
    sel = (jnp.abs(operand - inner_at_e)
           <= 1e-5 * jnp.abs(inner_at_e) + 1e-5).astype(jnp.float32)
    d_op = sel * has_recv * g_at_e

    dop_ref[:] = d_op
    de_ref[:] = jnp.dot(d_op, w_ref[:].T, preferred_element_type=jnp.float32)
    dw_ref[:] += jnp.dot(e_ref[:].T, d_op,
                         preferred_element_type=jnp.float32)


def _hoisted_bwd_call(add, e_t, w_e, b, padded_receivers, tile_blocks,
                      inner, g, num_nodes, node_block, edge_tile, interpret):
    e_pad, h = add.shape
    de = e_t.shape[1]
    t = e_pad // edge_tile
    nb_pad = -(-num_nodes // node_block) * node_block
    inner_p = jnp.pad(inner, ((0, nb_pad - num_nodes), (0, 0)))
    g_p = jnp.pad(g, ((0, nb_pad - num_nodes), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((edge_tile, h), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, de), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((de, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, edge_tile), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, h), lambda i, tb: (tb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, h), lambda i, tb: (tb[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((edge_tile, h), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, de), lambda i, tb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((de, h), lambda i, tb: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    d_op, d_e, d_w = pl.pallas_call(
        functools.partial(_hoisted_bwd_kernel, node_block=node_block,
                          edge_tile=edge_tile),
        out_shape=(
            jax.ShapeDtypeStruct((e_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((e_pad, de), jnp.float32),
            jax.ShapeDtypeStruct((de, h), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_blocks, add, e_t, w_e, b.reshape(1, h),
      padded_receivers.astype(jnp.int32).reshape(t, edge_tile),
      inner_p, g_p)
    return d_op, d_e, d_w


def make_fused_hoisted_aggregate_pallas_bwd(num_nodes: int,
                                            node_block: int = 128,
                                            edge_tile: int = 256,
                                            interpret: Optional[bool] = None):
    """Fused hoisted aggregation with Pallas forward AND backward kernels."""
    if interpret is None:
        interpret = _interpret_default()

    gather_dtype = jnp.bfloat16 if not interpret else jnp.float32

    @jax.custom_vjp
    def fused(y_s, e_t, w_e, b, senders_t, padded_recv, tile_blocks, offset):
        inner = _hoisted_pallas_call(
            y_s.astype(gather_dtype)[senders_t], e_t, w_e, b, padded_recv,
            tile_blocks, num_nodes, node_block, edge_tile, interpret)
        has = inner > _NEG / 2
        return jnp.where(has, offset + inner, 0.0)

    def fwd(y_s, e_t, w_e, b, senders_t, padded_recv, tile_blocks, offset):
        add = y_s.astype(gather_dtype)[senders_t]
        inner = _hoisted_pallas_call(
            add, e_t, w_e, b, padded_recv, tile_blocks,
            num_nodes, node_block, edge_tile, interpret)
        has = inner > _NEG / 2
        out = jnp.where(has, offset + inner, 0.0)
        return out, (y_s, e_t, w_e, b, senders_t, padded_recv, tile_blocks,
                     inner, has)

    def bwd(res, g):
        (y_s, e_t, w_e, b, senders_t, padded_recv, tile_blocks, inner,
         has) = res
        g_pass = jnp.where(has, g, 0.0)
        inner_z = jnp.where(has, inner, 0.0)
        add = y_s.astype(gather_dtype)[senders_t]
        d_op, d_e, d_w = _hoisted_bwd_call(
            add, e_t, w_e, b, padded_recv, tile_blocks, inner_z, g_pass,
            num_nodes, node_block, edge_tile, interpret)
        d_y_s = jax.ops.segment_sum(d_op, senders_t,
                                    num_segments=y_s.shape[0])
        d_b = jnp.sum(d_op, axis=0)
        return d_y_s, d_e, d_w, d_b, None, None, None, g_pass

    fused.defvjp(fwd, bwd)
    return fused


# ---------------------------------------------------------------------------
# fused dense fixed-degree aggregation v4 — the kNN family
#
# kNN graphs have EXACTLY k in-edges per receiver
# (/root/reference/graph_constructor/graph.py:57 — sklearn kneighbors_graph,
# k=20 at configurations/configuration_radarscenes.yml:20). The dense layout
# gives every receiver k fixed slots, neighbor-major within a tile of
# R_TILE receivers (slot j*R_TILE + r_local = receiver r's j-th in-edge), so
#   * the receiver landing one-hot matmul of the windowed (v3) kernels —
#     the single largest forward MAC item (f32 [TN,TE]@[TE,H]) — becomes a
#     (k-1)-fold static-slice VPU max,
#   * the backward's inner/g one-hot gather matmuls (~32% of backward MACs)
#     become direct BlockSpec slices of inner/g plus a per-slice compare,
#   * tiles never share receivers: each grid step writes its own [R_TILE,H]
#     output block once — no revisit initialization, no cross-tile max.
# The sender side keeps the v3 window machinery unchanged: Morton order,
# monotone per-tile windows, streamed [TE,W] one-hot gather (precomp_eq),
# fwd->bwd x_g streaming, and the fixed-budget XLA overflow path.
# ---------------------------------------------------------------------------

def dense_overflow_inner(x_c, w_s_c, e_ovf_c, w_e_c, ovf_s, ovf_r,
                         num_nodes: int, ovf_sorted: bool = True):
    """Shared XLA overflow aggregate of the dense (v4) family — used by
    the kernel path's forward AND the narrow-layer XLA fallback
    (models.layers._dense_xla_hoisted_max), so the sorted-lowering
    semantics live in ONE place: gather the few overflow senders at node
    width, mask dead slots to _NEG, cummax-fill the -1 padding so the
    index vector stays sorted (ovf_sorted — see check_overflow_sorted),
    and segment-max to raw per-node maxima (-inf for empty receivers)."""
    ovf_mask = ovf_r >= 0
    if ovf_sorted:
        ovf_r_c = jnp.maximum(
            jax.lax.cummax(jnp.where(ovf_mask, ovf_r, -1)), 0)
    else:
        ovf_r_c = jnp.where(ovf_mask, ovf_r, 0)
    y = jnp.dot(x_c[ovf_s], w_s_c, preferred_element_type=jnp.float32) \
        + jnp.dot(e_ovf_c, w_e_c, preferred_element_type=jnp.float32)
    op_o = jnp.where(ovf_mask[:, None], y, _NEG)
    return jax.ops.segment_max(op_o, ovf_r_c, num_segments=num_nodes,
                               indices_are_sorted=ovf_sorted)


def prepare_dense_knn_tiles(senders: np.ndarray, receivers: np.ndarray,
                            edge_mask: np.ndarray, num_nodes: int, k: int,
                            r_tile: int, node_block: int, window_blocks: int,
                            ovf_budget: Optional[int] = None):
    """Host tiler for the dense fixed-degree (v4) kernels.

    Slot layout: tile t covers receivers [t*r_tile, (t+1)*r_tile); receiver
    r's j-th valid in-edge sits at slot t*TE + j*r_tile + (r % r_tile) with
    TE = r_tile*k. Unfilled slots (padded receivers, in-degree < k, or
    out-of-window senders) carry senders_local -1.

    `k` is the SLOT count per receiver, not necessarily the graph's kNN
    degree: the reference aggregates at the kNN *target* side
    (`graph_constructor/graph.py:57-63` — E=(query, neighbor), PyG
    flow source_to_target lands at the neighbor), so in-degree is variable
    (flagship: mean 20, p90 26, max 42). Edges beyond a receiver's first
    `k` (its j-rank >= k) SPILL to the overflow path, exactly like
    out-of-window senders — k = graph_k + 4 keeps the spill ~2.4% at the
    flagship degree profile.

    Returns (perm [T*TE], senders_local [T*TE], tile_win [T],
    ovf_idx [ovf_budget]) with the same conventions as
    prepare_windowed_csr_tiles (perm dummy slots map to edge 0; ovf_idx -1
    pads; windows are monotone across tiles).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask)
    if num_nodes % r_tile:
        raise ValueError(f"num_nodes {num_nodes} not divisible by "
                         f"r_tile {r_tile}")
    te = r_tile * k
    t = num_nodes // r_tile
    num_blocks = -(-num_nodes // node_block)
    wb = min(window_blocks, num_blocks)

    valid = edge_mask & (receivers >= 0) & (receivers < num_nodes)
    eidx = np.flatnonzero(valid)
    r_v = receivers[eidx]
    order = np.argsort(r_v, kind="stable")
    eidx = eidx[order]
    r_v = r_v[order]
    deg = np.bincount(r_v, minlength=num_nodes)
    starts = np.cumsum(deg) - deg
    j = np.arange(len(eidx)) - starts[r_v]
    # over-degree edges (j-rank >= k) spill to the overflow path
    keep = j < k
    spill = eidx[~keep]
    slot = ((r_v // r_tile) * te + j * r_tile + (r_v % r_tile))[keep]

    perm = np.zeros(t * te, np.int64)
    sender_of_slot = np.full(t * te, -1, np.int64)
    perm[slot] = eidx[keep]
    sender_of_slot[slot] = senders[eidx[keep]]

    vslot = sender_of_slot >= 0
    hist = np.zeros((t, num_blocks), np.int64)
    tile_of_slot = np.repeat(np.arange(t), te)
    np.add.at(hist, (tile_of_slot[vslot], sender_of_slot[vslot] // node_block), 1)
    tile_win = _monotone_tile_windows(hist, wb)

    win_start = np.repeat(tile_win, te) * node_block
    in_win = vslot & (sender_of_slot >= win_start) \
        & (sender_of_slot < win_start + wb * node_block)
    ovf = np.concatenate([perm[vslot & ~in_win], spill])
    if ovf_budget is None:
        ovf_budget = max(te, -(-int(valid.sum() * 0.08) // te) * te)
    if len(ovf) > ovf_budget:
        raise ValueError(f"window overflow {len(ovf)} exceeds budget "
                         f"{ovf_budget}; increase window_blocks or budget")
    ovf = ovf[np.argsort(receivers[ovf], kind="stable")]
    ovf_idx = np.full(ovf_budget, -1, np.int64)
    ovf_idx[:len(ovf)] = ovf
    senders_local = np.where(in_win, sender_of_slot - win_start, -1)

    return (perm.astype(np.int32), senders_local.astype(np.int32),
            tile_win.astype(np.int32), ovf_idx.astype(np.int32))


def _fused_fwd_kernel_v4(tile_win_ref, *refs, r_tile: int, k: int,
                         window_blocks: int, save_xg: bool,
                         precomp_eq: bool, emit_inner: bool):
    i = window_blocks
    x_parts = refs[:i]
    ws_ref, e_ref, we_ref, sloc_ref = refs[i:i + 4]
    i += 4
    eqs_ref = None
    if precomp_eq:
        eqs_ref = refs[i]
        i += 1
    # overflow-path aggregate + hoisted receiver offset, combined in the
    # kernel epilogue (saves the per-layer [N,H] XLA combine round trips)
    inner_o_ref, offset_ref = refs[i:i + 2]
    i += 2
    out_ref = refs[i]
    i += 1
    inner_ref = None
    if emit_inner:
        # the VJP path saves the combined maxima for backward routing;
        # the no-grad (serving) path skips this [N,H] write entirely
        inner_ref = refs[i]
        i += 1

    t = pl.program_id(0)
    xw = jnp.concatenate([p[:] for p in x_parts], axis=0)      # [W, d_in]
    sloc2d = sloc_ref[pl.ds(t, 1), :]                           # [1, TE]
    if precomp_eq:
        # int8-streamed one-hot (r4 trace: the [TE,W] bf16 eq stream's DMA
        # binds the narrow layers' kernels at 1.18 MB/tile ×10 consumers);
        # the in-kernel widening cast trades VPU for half the DMA
        eq_s = eqs_ref[:].astype(xw.dtype)
    else:
        eq_s = _window_eq(sloc2d, r_tile * k, xw.shape[0], xw.dtype)
    x_g = jnp.dot(eq_s, xw,
                  preferred_element_type=jnp.float32).astype(xw.dtype)
    if save_xg:
        refs[i][:] = x_g
    op = jnp.dot(x_g, ws_ref[:], preferred_element_type=jnp.float32) \
        + jnp.dot(e_ref[:], we_ref[:], preferred_element_type=jnp.float32)
    # transpose the int32 BEFORE comparing — Mosaic cannot legalize a
    # bool tpu.transpose (same pattern as the v3 kernels)
    validc = jnp.transpose(sloc2d) >= 0                         # [TE, 1]
    op = jnp.where(validc, op, _NEG)
    # fixed-degree reduction over the neighbor-major slots — no landing
    # matmul, no roll loop. The leading-dim reshape is a row-view (slot
    # j·R + r ↔ [j, r]); one reduce beats (k−1) sequential slice maxima
    # (r5: the slice chain serialized on the VPU)
    if _DENSE_RESHAPE:
        acc = jnp.max(op.reshape(k, r_tile, op.shape[-1]), axis=0)
    else:
        acc = op[0:r_tile]
        for jj in range(1, k):
            acc = jnp.maximum(acc, op[jj * r_tile:(jj + 1) * r_tile])
    inner = jnp.maximum(acc, inner_o_ref[:])
    if inner_ref is not None:
        inner_ref[:] = inner
    has = inner > _NEG / 2
    out_ref[:] = jnp.where(has, offset_ref[:] + inner, 0.0)


def _fused_bwd_kernel_v4(tile_win_ref, *refs, r_tile: int, k: int,
                         node_block: int, window_blocks: int,
                         bf16_cmp: bool, precomp_eq: bool,
                         sender_dx: bool = False,
                         grad_dtype=jnp.bfloat16):
    wb = window_blocks
    xg_ref = refs[0]
    ws_ref, e_ref, we_ref, sloc_ref = refs[1:5]
    i = 5
    eqs_ref = None
    if precomp_eq:
        eqs_ref = refs[i]
        i += 1
    inner_ref, g_ref = refs[i:i + 2]
    i += 2
    if sender_dx:
        # sender-space landing: the kernel emits H-wide per-part sums
        # d_ys = eq_sᵀ @ d_op; d_x = d_ys @ W_sᵀ and dW_s = xᵀ @ d_ys
        # become node-wide XLA matmuls (no in-kernel d_xg / dW_s)
        de_ref, dwe_ref = refs[i:i + 2]
        i += 2
        dws_ref = None
    else:
        de_ref, dws_ref, dwe_ref = refs[i:i + 3]
        i += 3
    dx_parts = refs[i:i + wb]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        if dws_ref is not None:
            dws_ref[:] = jnp.zeros_like(dws_ref)
        dwe_ref[:] = jnp.zeros_like(dwe_ref)

    win_changed = jnp.logical_or(
        t == 0, tile_win_ref[jnp.maximum(t - 1, 0)] != tile_win_ref[t])

    @pl.when(win_changed)
    def _():
        for dxp in dx_parts:
            dxp[:] = jnp.zeros_like(dxp)

    cd = grad_dtype
    sloc2d = sloc_ref[pl.ds(t, 1), :]
    if precomp_eq:
        eq_s = eqs_ref[:].astype(cd)
    else:
        eq_s = _window_eq(sloc2d, r_tile * k, wb * node_block, cd)
    x_g = xg_ref[:]                                             # [TE, d_in]
    op = jnp.dot(x_g, ws_ref[:], preferred_element_type=jnp.float32) \
        + jnp.dot(e_ref[:], we_ref[:], preferred_element_type=jnp.float32)
    validc = jnp.transpose(sloc2d) >= 0                         # [TE, 1]
    inner = inner_ref[:].astype(jnp.float32)                    # [R, H]
    g = g_ref[:]                                                # [R, H]
    if bf16_cmp:
        # inner holds exactly-bf16 values in f32; bf16-rounding the
        # recomputed operand makes f32 equality exact bf16 equality (the
        # argmax edge always matches — see make_fused_hoisted_aggregate_v3)
        op = op.astype(jnp.bfloat16).astype(jnp.float32)
    if _DENSE_RESHAPE:
        # broadcast routing over the [k, R, H] row-view — one compare +
        # select instead of a k-slice loop feeding a k-way concatenate
        h = op.shape[-1]
        op3 = op.reshape(k, r_tile, h)
        if bf16_cmp:
            sel3 = (op3 == inner[None]).astype(jnp.float32)
        else:
            sel3 = (jnp.abs(op3 - inner[None])
                    <= 1e-5 * jnp.abs(inner)[None] + 1e-5
                    ).astype(jnp.float32)
        d_op = (sel3 * g[None]).reshape(k * r_tile, h)
    else:
        slices = []
        for jj in range(k):
            opj = op[jj * r_tile:(jj + 1) * r_tile]
            if bf16_cmp:
                sel = (opj == inner).astype(jnp.float32)
            else:
                sel = (jnp.abs(opj - inner)
                       <= 1e-5 * jnp.abs(inner) + 1e-5).astype(jnp.float32)
            slices.append(sel * g)
        d_op = jnp.concatenate(slices, axis=0)                  # [TE, H]
    d_op = jnp.where(validc, d_op, 0.0)

    d_op_c = d_op.astype(cd)
    de_ref[:] = jnp.dot(d_op_c, we_ref[:].T,
                        preferred_element_type=jnp.float32
                        ).astype(de_ref.dtype)
    dwe_ref[:] += jnp.dot(e_ref[:].T, d_op_c,
                          preferred_element_type=jnp.float32)
    if sender_dx:
        dxw = jnp.dot(eq_s.T, d_op_c,
                      preferred_element_type=jnp.float32)       # [W, H]
    else:
        d_xg = jnp.dot(d_op_c, ws_ref[:].T,
                       preferred_element_type=jnp.float32)      # [TE, d_in]
        dws_ref[:] += jnp.dot(x_g.T, d_op_c,
                              preferred_element_type=jnp.float32)
        dxw = jnp.dot(eq_s.T, d_xg.astype(cd),
                      preferred_element_type=jnp.float32)       # [W, d_in]
    for jj, dxp in enumerate(dx_parts):
        dxp[:] += dxw[jj * node_block:(jj + 1) * node_block]


def _fused_fwd_call_v4(x_c, w_s, e_t, w_e, senders_local, tile_win,
                       inner_ovf, offset, num_nodes, k, r_tile, node_block,
                       window_blocks, interpret, save_xg=False, eq_m=None):
    n_pad_in, d_in = x_c.shape
    h = w_s.shape[1]
    de = e_t.shape[1]
    te = r_tile * k
    e_pad = e_t.shape[0]
    t = e_pad // te
    w_width = window_blocks * node_block
    nb_pad = -(-num_nodes // node_block) * node_block
    nblocks_pad = nb_pad // node_block
    xp = jnp.pad(x_c, ((0, nb_pad - n_pad_in), (0, 0)))

    def part_map(j):
        return lambda i, tw: (jnp.minimum(tw[i] + j, nblocks_pad - 1), 0)

    in_specs = [pl.BlockSpec((node_block, d_in), part_map(j),
                             memory_space=pltpu.VMEM)
                for j in range(window_blocks)]
    in_specs += [
        pl.BlockSpec((d_in, h), lambda i, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((te, de), lambda i, tw: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((de, h), lambda i, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, te), lambda i, tw: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [tile_win, *([xp] * window_blocks), w_s, e_t, w_e,
              senders_local.astype(jnp.int32).reshape(t, te)]
    if eq_m is not None:
        in_specs.append(pl.BlockSpec((te, w_width), lambda i, tw: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(eq_m)
    in_specs += [
        pl.BlockSpec((r_tile, h), lambda i, tw: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r_tile, h), lambda i, tw: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs += [inner_ovf, offset]
    out_specs = [pl.BlockSpec((r_tile, h), lambda i, tw: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((num_nodes, h), jnp.float32)]
    emit_inner = save_xg         # only the VJP path needs the maxima back
    if emit_inner:
        out_specs.append(pl.BlockSpec((r_tile, h), lambda i, tw: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((num_nodes, h), jnp.float32))
    if save_xg:
        out_specs.append(pl.BlockSpec((te, d_in), lambda i, tw: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((e_pad, d_in), x_c.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
    )
    out = pl.pallas_call(
        functools.partial(_fused_fwd_kernel_v4, r_tile=r_tile, k=k,
                          window_blocks=window_blocks, save_xg=save_xg,
                          precomp_eq=eq_m is not None,
                          emit_inner=emit_inner),
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    if len(out_shape) == 1:
        return (out,)
    return tuple(out)


def _fused_bwd_call_v4(xg_stream, w_s, e_t, w_e, senders_local, tile_win,
                       inner, g, num_nodes, k, r_tile, node_block,
                       window_blocks, interpret, bf16_cmp=False, eq_m=None,
                       sender_dx=False):
    d_in = w_s.shape[0]
    h = w_s.shape[1]
    de = e_t.shape[1]
    te = r_tile * k
    e_pad = e_t.shape[0]
    t = e_pad // te
    w_width = window_blocks * node_block
    nb_pad = -(-num_nodes // node_block) * node_block
    nblocks_pad = nb_pad // node_block
    inner_p = inner
    if bf16_cmp:
        inner_p = inner_p.astype(jnp.bfloat16)

    in_specs = [
        pl.BlockSpec((te, d_in), lambda i, tw: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d_in, h), lambda i, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((te, de), lambda i, tw: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((de, h), lambda i, tw: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, te), lambda i, tw: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [tile_win, xg_stream, w_s, e_t, w_e,
              senders_local.astype(jnp.int32).reshape(t, te)]
    if eq_m is not None:
        in_specs.append(pl.BlockSpec((te, w_width), lambda i, tw: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(eq_m)
    in_specs += [
        pl.BlockSpec((r_tile, h), lambda i, tw: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r_tile, h), lambda i, tw: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs += [inner_p, g]

    def part_map(j):
        return lambda i, tw: (jnp.minimum(tw[i] + j, nblocks_pad - 1), 0)

    out_specs = [
        pl.BlockSpec((te, de), lambda i, tw: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((e_pad, de), e_t.dtype),
    ]
    if not sender_dx:
        out_specs.append(pl.BlockSpec((d_in, h), lambda i, tw: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((d_in, h), jnp.float32))
    out_specs.append(pl.BlockSpec((de, h), lambda i, tw: (0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((de, h), jnp.float32))
    part_w = h if sender_dx else d_in
    out_specs += [pl.BlockSpec((node_block, part_w), part_map(j),
                               memory_space=pltpu.VMEM)
                  for j in range(window_blocks)]
    out_shape += [jax.ShapeDtypeStruct((nb_pad, part_w), jnp.float32)
                  for _ in range(window_blocks)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(t,), in_specs=in_specs,
        out_specs=tuple(out_specs))
    outs = pl.pallas_call(
        functools.partial(_fused_bwd_kernel_v4, r_tile=r_tile, k=k,
                          node_block=node_block,
                          window_blocks=window_blocks, bf16_cmp=bf16_cmp,
                          precomp_eq=eq_m is not None,
                          sender_dx=sender_dx,
                          grad_dtype=(jnp.float32 if interpret
                                      else jnp.bfloat16)),
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    if sender_dx:
        d_e, d_we = outs[:2]
        return d_e, None, d_we, outs[2:]
    d_e, d_ws, d_we = outs[:3]
    return d_e, d_ws, d_we, outs[3:]


def make_fused_dense_aggregate(num_nodes: int, k: int, r_tile: int = 32,
                               node_block: int = 256,
                               window_blocks: int = 3,
                               interpret: Optional[bool] = None,
                               bf16_max: bool = False,
                               precomp_eq: bool = True,
                               ovf_sorted: bool = True,
                               ovf_ssum: bool = False,
                               ovf_edge_tile: int = 256,
                               sender_dx: bool = False):
    """Dense fixed-degree fused max-aggregation (see section comment).

    `ovf_ssum` (r5): land the overflow backward's d_x through the
    SENDER-sorted segment-sum kernel (pallas_segment_sum_csr) instead of
    XLA's scatter-add — the r4 trace put that scatter at ~1.0 ms/step
    (~4× its bandwidth floor). The host tiler supplies a sender-CSR
    tiling of the overflow slots (prepare_csr_tiles over ovf_senders —
    host sorting is free at plan build; the r4 negative was a per-step
    DEVICE argsort). The fused signature gains the three tiling
    operands:

    fused(x, w_s, e_t, w_e, offset, e_ovf, tile_win, senders_local,
          part_mask, ovf_s, ovf_r, ossum_perm, ossum_send, ossum_blocks)

    Measured r5 negative (do not rebuild): running the WHOLE overflow
    path through the v2 CSR kernels (receiver-tiled fwd segment-max +
    in-kernel routing bwd) benched 10.47M vs the 11.41M XLA-overflow
    baseline — the ~2.2× slot padding of per-block overflow tiles plus
    HIGHEST landings on tiny tiles cost more than the XLA segment ops
    they replace. Only the scatter side wins.

    `ovf_sorted`: the single-chip tiler (prepare_dense_knn_tiles) emits
    receiver-sorted overflow, enabling the sorted segment_max lowering;
    the HALO plans' per-shard overflow (window overflow + over-degree
    spill + halo edges appended per shard) is NOT receiver-sorted in
    augmented-index space — pass False there (same contract as
    make_fused_hoisted_aggregate_v3).

    fused(x, w_s, e_t, w_e, offset, e_ovf, tile_win, senders_local,
          part_mask, ovf_s, ovf_r)
      inner[n] = max over in-window slots and overflow edges with
                 receiver n of (x[sender] @ w_s + e @ w_e)
      out[n]   = offset[n] + inner[n] for non-empty n, else 0.

    Differentiable args: x, w_s, e_t (slot-ordered edge features,
    prepare_dense_knn_tiles layout), w_e, offset, e_ovf. `bf16_max` and
    `precomp_eq` follow the v3 semantics (make_fused_hoisted_aggregate_v3
    docstring); the strict default routes gradients by exact-f32 operand
    recompute with the same tolerance as the windowed kernels.
    """
    if interpret is None:
        interpret = _interpret_default()
    if num_nodes % r_tile:
        raise ValueError(f"num_nodes {num_nodes} not divisible by "
                         f"r_tile {r_tile}")
    gather_dtype = jnp.bfloat16 if not interpret else jnp.float32
    nb_pad = -(-num_nodes // node_block) * node_block
    w_width = window_blocks * node_block
    # the dense kernels stream the one-hot as int8 and widen in-kernel —
    # half the DMA of the v3 bf16 stream (the binding cost of the narrow
    # layers' kernels, r4 trace); interpret mode keeps f32 exactness
    eq_dtype = jnp.int8 if not interpret else jnp.float32

    def _eq_m(senders_local):
        if not precomp_eq:
            return None
        cols = jnp.arange(w_width, dtype=jnp.int32)
        return (senders_local[:, None] == cols[None, :]).astype(eq_dtype)

    def _ovf_operand(x, w_s, e_ovf, w_e, ovf_s, ovf_mask):
        cd = gather_dtype
        x_o = x.astype(cd)[ovf_s]
        y_s = jnp.dot(x_o, w_s.astype(cd),
                      preferred_element_type=jnp.float32)
        y_e = jnp.dot(e_ovf.astype(cd), w_e.astype(cd),
                      preferred_element_type=jnp.float32)
        return jnp.where(ovf_mask[:, None], y_s + y_e, _NEG)

    def _forward(x, w_s, e_t, w_e, offset, e_ovf, tile_win, senders_local,
                 ovf_s, ovf_r, for_vjp=False):
        if ovf_sorted:
            check_overflow_sorted(ovf_r, "fused dense aggregate (v4)")
        x_c = x.astype(gather_dtype)
        # overflow aggregate FIRST (small XLA segment-max over the fixed
        # budget, dense_overflow_inner); the kernel epilogue combines it
        # with the dense max and applies offset/empty-handling — no
        # per-layer [N,H] XLA combine
        inner_o = dense_overflow_inner(
            x_c, w_s.astype(gather_dtype), e_ovf.astype(gather_dtype),
            w_e.astype(gather_dtype), ovf_s, ovf_r, num_nodes,
            ovf_sorted=ovf_sorted)
        res = _fused_fwd_call_v4(
            x_c, w_s.astype(gather_dtype), e_t.astype(gather_dtype),
            w_e.astype(gather_dtype), senders_local, tile_win, inner_o,
            offset, num_nodes, k, r_tile, node_block, window_blocks,
            interpret, save_xg=for_vjp, eq_m=_eq_m(senders_local))
        if for_vjp:
            out, inner, stream = res
        else:
            out, inner, stream = res[0], None, None
        return out, inner, stream

    n_sig = 14 if ovf_ssum else 11

    @jax.custom_vjp
    def fused(x, w_s, e_t, w_e, offset, e_ovf, tile_win, senders_local,
              part_mask, ovf_s, ovf_r, *ossum):
        out, _, _ = _forward(x, w_s, e_t, w_e, offset, e_ovf, tile_win,
                             senders_local, ovf_s, ovf_r)
        return out

    def fwd(x, w_s, e_t, w_e, offset, e_ovf, tile_win, senders_local,
            part_mask, ovf_s, ovf_r, *ossum):
        out, inner, stream = _forward(
            x, w_s, e_t, w_e, offset, e_ovf, tile_win, senders_local,
            ovf_s, ovf_r, for_vjp=True)
        return out, (x, w_s, e_t, w_e, e_ovf, tile_win, senders_local,
                     part_mask, ovf_s, ovf_r, ossum, inner, stream)

    def bwd(res, g):
        (x, w_s, e_t, w_e, e_ovf, tile_win, senders_local, part_mask,
         ovf_s, ovf_r, ossum, inner, stream) = res
        has = inner > _NEG / 2
        g_pass = jnp.where(has, g, 0.0)
        inner_z = jnp.where(has, inner, 0.0)
        d_e_t, d_ws, d_we, parts = _fused_bwd_call_v4(
            stream, w_s.astype(gather_dtype), e_t.astype(gather_dtype),
            w_e.astype(gather_dtype), senders_local, tile_win, inner_z,
            g_pass, num_nodes, k, r_tile, node_block, window_blocks,
            interpret, bf16_cmp=bf16_max, eq_m=_eq_m(senders_local),
            sender_dx=sender_dx)
        d_e_t = d_e_t.astype(e_t.dtype)
        row_masks = jnp.repeat(part_mask, node_block, axis=1)  # [WB, nb_pad]
        part_w = w_s.shape[1] if sender_dx else x.shape[1]
        acc = jnp.zeros((nb_pad, part_w), jnp.float32)
        for j, p in enumerate(parts):
            acc = acc + jnp.where(row_masks[j][:, None], p, 0.0)
        if sender_dx:
            # H-wide sender sums: d_x and dW_s become node-wide matmuls
            d_ys = acc[:x.shape[0]]
            cd_ = gather_dtype
            d_x = jnp.dot(d_ys.astype(cd_), w_s.T.astype(cd_),
                          preferred_element_type=jnp.float32)
            d_ws = jnp.dot(x.astype(cd_).T, d_ys.astype(cd_),
                           preferred_element_type=jnp.float32)
        else:
            d_x = acc[:x.shape[0]]

        # overflow backward (small, XLA)
        ovf_mask = ovf_r >= 0
        ovf_r_c = jnp.where(ovf_mask, ovf_r, 0)
        op_o = _ovf_operand(x, w_s, e_ovf, w_e, ovf_s, ovf_mask)
        if bf16_max:
            sel_o = ovf_mask[:, None] & (
                op_o.astype(jnp.bfloat16)
                == inner_z[ovf_r_c].astype(jnp.bfloat16))
        else:
            sel_o = ovf_mask[:, None] & (
                jnp.abs(op_o - inner_z[ovf_r_c])
                <= 1e-5 * jnp.abs(inner_z[ovf_r_c]) + 1e-5)
        d_op_o = jnp.where(sel_o, g_pass[ovf_r_c], 0.0)
        if ovf_ssum:
            # r5: the d_x landing rides the sender-sorted segment-sum
            # kernel (host-built tiling — free at plan build; the r4
            # negative was a per-step DEVICE argsort). The projection and
            # permutation gather run in bf16 (gradients ride bf16 in the
            # main kernels too); accumulation stays f32 in-kernel.
            ossum_perm, ossum_send, ossum_blocks = ossum
            d_xo = (d_op_o.astype(gather_dtype)
                    @ w_s.T.astype(gather_dtype)).astype(gather_dtype)
            d_x = d_x + pallas_segment_sum_csr(
                d_xo[ossum_perm], ossum_send, ossum_blocks, num_nodes,
                node_block, ovf_edge_tile, interpret)
        else:
            # NOTE (measured r4): device-argsorting the overflow senders
            # to use the sorted segment_sum lowering here ran 3.9% SLOWER
            # end-to-end (11.03M vs 11.48M) — the per-step argsort +
            # [Eovf, d] gather cost more than the unsorted scatter saves.
            d_x = d_x + jax.ops.segment_sum(d_op_o @ w_s.T, ovf_s,
                                            num_segments=num_nodes)
        d_ws = d_ws + x[ovf_s].T @ d_op_o
        d_we = d_we + e_ovf.astype(jnp.float32).T @ d_op_o
        d_e_ovf = (d_op_o @ w_e.T).astype(e_ovf.dtype)

        return (d_x, d_ws, d_e_t, d_we, g_pass, d_e_ovf) \
            + (None,) * (n_sig - 6)

    fused.defvjp(fwd, bwd)
    return fused
