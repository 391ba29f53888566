"""Pallas TPU kernel for the blocked arbitrary-angle rotation.

Same semantics as `ops.geometry._rotate_apply_blocked` (the gather-free
re-expression of ``ppmx-edward.c:727-785``: output tiled G x L, per-tile
source block, zone-folded banded tap weights), with the whole per-tile
dataflow kept in VMEM:

- DOUBLE-BUFFERED per-tile DMA: tile t+1's uint8 source block streams
  HBM -> VMEM while tile t computes (row start 8-aligned, column start
  128-aligned; a dynamic `pltpu.roll` re-centers lanes so the matmul
  contraction stays at BWP lanes);
- the zone/tap decisions run ONCE per tile on the full [G, L] block with
  the SAME double-f32 helpers as the XLA path (`geometry._zone_taps`) —
  [G, L] = [16, 128] is two fully-packed vregs, so the geometry chain
  costs ~2 vreg-ops per scalar op instead of the 16x sublane-padded
  [1, L] form;
- the banded selector matrices are built by `tpu.dynamic_gather`
  (jnp.take_along_axis) from 8-row tap tables: one compare + one gather
  per 8-sublane slab instead of a 4-way compare-select chain per tap.
  Mosaic requires the gather source to fit a single vreg along the
  gather dimension (8 sublanes for 32-bit) — the tables are [8, G*L];
- the x-resample runs as TWO int8 MXU matmuls with int32 accumulation:
  tap weights are quantized to w ~= q1/64 + q2/8192 (both int8; scales
  are powers of two so the edge band's one-hot weights reconstruct
  EXACTLY and nearest-neighbor pixels stay bit-exact). Interior weight
  error is <= 2^-14 per tap -> < 0.08 LSB on the pixel value, well
  inside the documented +-1 budget (tighter than the XLA path's
  Precision.HIGH);
- the y-combine is an f32 VPU multiply + sublane reduction, identical in
  structure to the XLA path.

Unlike the XLA formulation - whose measured ~52 ms structural floor at
4K/30deg is per-tile dynamic_slice + [C, BH, P] intermediate traffic - no
intermediate ever touches HBM here; per tile the only HBM traffic is the
uint8 block read and the uint8 tile write.

The kernel compiles per (H, W, angle) like the XLA path — but in
MINUTES (Mosaic), vs seconds for XLA, while winning only ~1.3 ms/call at
4K. `ops.geometry.rotate` therefore dispatches here only under
IPT_PALLAS_ROTATE=1 (explicit opt-in for long same-geometry services);
images whose plan doesn't fit fall back to the XLA path regardless.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageprocessingtools_tpu.ops import geometry as _g

_S1 = 64.0        # 2^6  — first quantization level (int8 range: |w| <= 1)
_S2 = 8192.0      # 2^13 — residual level; combined error <= 2^-14 per tap
_INV1 = 1.0 / _S1
_INV2 = 1.0 / _S2


# Output tile shape, probed on hardware at 4K/30deg (same-run): G=16 wins
# at 57.0 ms vs 82.9 at G=32 — the taller tile pushes bw past 128, and the
# K=256 int8 dots (mostly zero rows) cost far more than the halved
# per-grid-step overhead saves. Kept parameterized for per-angle tuning.
_TILE_G = 16
_TILE_L = 128

# Round-5 skeleton knobs (the round-3 ablation attributed ~32 ms of the 4K
# dispatch to "DMA + grid skeleton"): _TILE_T g-tiles are processed per
# grid step (shared geometry/selector build, per-tile dots and blocks) and
# _N_SLOTS is the input-block buffer depth. Values shipped here are the
# winners of the round-5 two-phase rank-protocol A/B
# (ROTATE_SKELETON_AB_r05.json + ROTATE_SKELETON_AB2_r05.json): T=2/T=4
# (1.05-1.12x) and slots=3 LOSE, and so do the T=2/T=4 "sharedblk" union
# blocks that cut input-DMA row-transactions to 0.58x/0.375x — so the
# input DMA is fully overlapped and the kernel is COMPUTE-ISSUE-bound
# (selector gathers + y-stage VPU product), not DMA-bound; the round-3
# ablation's stage costs sum past the wall because stages overlap.
_TILE_T = 1
_N_SLOTS = 2


# Cost-attribution knob (tools/ablate_pallas_rotate.py): members replace a
# stage with cheap fakes of the same shape/dtype. NEVER set in production.
# Members: "geom", "flat", "build", "dot2", "dots", "ystage".
_ABLATE: frozenset = frozenset()

# Round-4 formulation variants (tools/rotate_ystage_ab.py A/B'd these on
# hardware — ROTATE_YSTAGE_AB_r04.json, 7 interleaved rounds at 4K/30):
# - "ydot": the y-combine's column-group sums as ONE ones-vector MXU dot
#   ([1, BH] x [BH, G*L]) + lane-slice unflat, instead of G sliced
#   sublane-reduction chains. MEASURED REJECTED: median 32.40 ms vs 31.45
#   base — the M=1 dot pays a full MXU pass per col_sums. (A literal
#   "second quantized dot" for the y-stage is impossible: out[p] =
#   sum_r wy[r,p] * h[r,p] is a PER-COLUMN weighted reduction =
#   diag(wy^T h); an MXU dot would compute the full [GL, GL] product for
#   its diagonal, a 2048x waste. The reducible part is the reduction
#   itself, which this variant moved to the MXU — and lost.)
# - "packgather": the two x-tap selector tables packed into ONE
#   16-bit-in-f32 table ((q1+128)*256 + (q2+128), exact in f32), halving
#   the dynamic_gather slab count of the selector-build stage; w1/w2 are
#   recovered with a shift/mask after one gather. WON (median 31.08 ms,
#   rank-first 5/7, mean rank 0.86 vs base 1.0) -> production default.
# - "outdma" (round 5): manual double-buffered output-write DMA (out_ref
#   in ANY, staged through a VMEM scratch) instead of the pipeline
#   emitter's own output handling. Rank-FIRST in both round-5 skeleton
#   phases (mean rank 0.33/0.43, median ratio 0.992/0.994, 10/16 round
#   wins vs base) — a small (~0.8%) but consistent win -> production.
# - "sharedblk" (round 5): ONE union-block DMA per multi-tile step.
#   MEASURED REJECTED (ROTATE_SKELETON_AB2_r05.json): 1.05-1.10x despite
#   0.58x/0.375x row-transactions — kept for the A/B harness only.
_VARIANTS: frozenset = frozenset({"packgather", "outdma"})


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=32)
def _pallas_plan(height: int, width: int, angle: float, G: int, L: int):
    """Host-side plan: the XLA blocked plan + DMA alignment. None if unfit."""
    # Default G/L call the 3-arg form so the lru_cache entry is GENUINELY
    # shared with the XLA path (lru_cache keys on the exact argument tuple:
    # (h, w, a, None, None) and (h, w, a) would be distinct entries).
    if G == _g._BLOCK_G and L == _g._BLOCK_L:
        plan = _g._blocked_plan(height, width, angle)
    else:
        plan = _g._blocked_plan(height, width, angle, G, L)
    if plan is None:
        return None
    new_h, new_w, bh, bw, n_g, n_k, splits, sy, sx, xc, yc = plan
    bwp = 128 if bw <= 128 else 256       # matmul K (post-roll lanes)
    if bw > bwp:
        return None
    # DMA width: one extra 128-lane group for the aligned start, rounded to
    # a POWER OF TWO lane count — Mosaic's dynamic lane roll silently
    # corrupts 3-vreg (384-lane) arrays on hardware (verified: 256/512 ok,
    # 384 wrong for every nonzero shift).
    bwc = 256 if bwp == 128 else 512
    bh_al = _round_up(bh + 7, 8)
    h_pad = _round_up(height, 8)
    w_pad = _round_up(width, 128)
    if w_pad < bwc or h_pad < bh_al:
        return None
    cap_y = h_pad - bh_al                 # multiple of 8
    cap_x = w_pad - bwc                   # multiple of 128
    sy_al = np.minimum(sy & ~7, cap_y).astype(np.int32)
    sx_al = np.minimum(sx & ~127, cap_x).astype(np.int32)
    d = (sx - sx_al).astype(np.int32)     # residual lane shift, < bwc - bw + 4
    return (
        new_h, new_w, bh_al, bwp, bwc, n_g, n_k, splits,
        sy_al.reshape(-1), sx_al.reshape(-1), d.reshape(-1),
        xc, yc, h_pad, w_pad,
    )


def _make_kernel(n_k, n_steps, bh_al, bwp, width, height, xc, yc, nch, G, L,
                 variants: frozenset = frozenset(), T: int = 1,
                 n_slots: int = 2):
    """``T`` g-tiles are processed per grid step (round 5: halves/quarters
    the per-step fixed cost of the DMA/grid skeleton — the stated ~32 ms
    floor of the round-3 ablation — while the geometry chain and selector
    gathers run ONCE on the [T*G, L] union and the per-tile dots keep
    K=bwp); ``n_slots`` is the input-block buffer depth (2 = classic
    double buffering, 3 = one extra step of DMA slack)."""
    GL = G * L
    TG = T * G
    TGL = T * GL

    shared = "sharedblk" in variants

    def kernel(sy_ref, sxa_ref, d_ref, syst_ref, sxst_ref,
               planes_ref, axh_ref, axl_ref, ayh_ref, ayl_ref,
               bxh_ref, bxl_ref, byh_ref, byl_ref,
               out_ref, blk, sem, *outdma_scratch):
        g2 = pl.program_id(0)
        k = pl.program_id(1)
        s = g2 * n_k + k
        slot = lax.rem(s, n_slots)
        bwc = blk.shape[-1]
        bh_blk = blk.shape[-2]

        def tile_t(ss, i):
            # flat tile index of step ss's i-th g-tile
            return (T * (ss // n_k) + i) * n_k + lax.rem(ss, n_k)

        if shared:
            # "sharedblk": ONE DMA per step covering all T g-tiles' source
            # blocks — adjacent g-tiles' blocks overlap by bh - ~cos*G
            # rows, so the union block moves ~(bh + (T-1)*cos*G)/(T*bh) of
            # the per-tile bytes in 1/T the DMA issues (the measured wall:
            # the T2/T4 split-block variants showed per-step cost ~0).
            def copies_for(ss, sl):
                syt = pl.multiple_of(syst_ref[ss], 8)
                sxt = pl.multiple_of(sxst_ref[ss], 128)
                return [pltpu.make_async_copy(
                    planes_ref.at[:, pl.ds(syt, bh_blk), pl.ds(sxt, bwc)],
                    blk.at[sl], sem.at[sl],
                )]
        else:
            def copies_for(ss, sl):
                out = []
                for i in range(T):
                    tt = tile_t(ss, i)
                    syt = pl.multiple_of(sy_ref[tt], 8)
                    sxt = pl.multiple_of(sxa_ref[tt], 128)
                    out.append(pltpu.make_async_copy(
                        planes_ref.at[:, pl.ds(syt, bh_al), pl.ds(sxt, bwc)],
                        blk.at[sl, i], sem.at[sl, i],
                    ))
                return out

        @pl.when(s == 0)
        def _():
            for j in range(min(n_slots - 1, n_steps)):  # warm the pipeline
                for cp in copies_for(j, j % n_slots):
                    cp.start()

        @pl.when(s + n_slots - 1 < n_steps)
        def _():
            for cp in copies_for(s + n_slots - 1,
                                 lax.rem(s + n_slots - 1, n_slots)):
                cp.start()

        # --- whole-step geometry on [T*G, L] (same helpers as XLA path) ---
        if "geom" in _ABLATE:
            fi = (lax.broadcasted_iota(jnp.int32, (TG, L), 1)
                  + axh_ref[0].astype(jnp.int32) + bxh_ref[0].astype(jnp.int32))
            base_x = fi % jnp.int32(max(width - 4, 1))
            base_y = (fi + ayh_ref[0].astype(jnp.int32)
                      + byh_ref[0].astype(jnp.int32)) % jnp.int32(
                          max(height - 4, 1))
            ff = base_x.astype(jnp.float32) * jnp.float32(1e-3)
            wxs = [ff, ff, ff, ff]
            wys = [ff, ff, ff, ff]
        else:
            base_x, base_y, wxs, wys = _g._zone_taps(
                (axh_ref[0], axl_ref[0]),          # [1, L]
                (bxh_ref[0], bxl_ref[0]),          # [T*G, 1]
                (ayh_ref[0], ayl_ref[0]),
                (byh_ref[0], byl_ref[0]),
                xc, yc, width, height,
            )
        # Per-tile block-start scalars, broadcast to the [TG, L] rows of
        # their own tile (row iota // G picks the tile; T is small and
        # static, so the where-chain is T-1 selects).
        ts = [tile_t(s, i) for i in range(T)]
        ds_ = [d_ref[tt] for tt in ts]
        if T == 1:
            sx_rows = sxa_ref[ts[0]] + ds_[0]
            sy_rows = sy_ref[ts[0]]
        else:
            tile_of_row = lax.broadcasted_iota(jnp.int32, (TG, L), 0) // G
            sx_rows = sxa_ref[ts[-1]] + ds_[-1]
            sy_rows = sy_ref[ts[-1]]
            for i in range(T - 2, -1, -1):
                sx_rows = jnp.where(tile_of_row == i,
                                    sxa_ref[ts[i]] + ds_[i], sx_rows)
                sy_rows = jnp.where(tile_of_row == i, sy_ref[ts[i]], sy_rows)
        relx = base_x - sx_rows                # [TG, L] i32
        rely = base_y - sy_rows

        # --- power-of-two int8 quantization of the x tap weights ----------
        q1s, q2s = [], []
        for tap in range(4):
            q1 = jnp.floor(wxs[tap] * _S1 + 0.5)
            q2 = jnp.floor((wxs[tap] - q1 * _INV1) * _S2 + 0.5)
            q1s.append(q1)
            q2s.append(q2)
        cs1 = q1s[0] + q1s[1] + q1s[2] + q1s[3]              # [G, L] f32
        cs2 = q2s[0] + q2s[1] + q2s[2] + q2s[3]
        corr = 128.0 * (cs1 * _INV1 + cs2 * _INV2)           # [G, L] f32

        def flat(v):
            # [TG, L] -> [1, TG*L] by lane-concat of sublane rows (Mosaic
            # has no [TG, L] -> [1, TGL] shape cast). Each row is rolled to
            # sublane 0 first: tpu.concatenate requires matching sublane
            # offsets on the non-concat dim, and a bare v[gg:gg+1] slice
            # keeps offset {gg, 0}.
            return jnp.concatenate(
                [(pltpu.roll(v, TG - gg, 0) if gg else v)[0:1, :]
                 for gg in range(TG)], axis=1)

        if "flat" in _ABLATE:
            # [1, TGL] data-dependent seed without sublane+lane broadcasts
            # (Mosaic can't broadcast [1, 1] into both dims).
            seed = jnp.concatenate(
                [relx[0:1, :] + rely[0:1, :]] * (TGL // L), axis=1)
            relx_f = (lax.broadcasted_iota(jnp.int32, (1, TGL), 1) % 64
                      + seed % 8)
            rely_f = relx_f % 32
            tabs = (lax.broadcasted_iota(jnp.int32, (8, TGL), 1)
                    + seed).astype(jnp.float32) \
                + jnp.concatenate([corr[0:1, :]] * (TGL // L), axis=1)
            tab1 = tab2 = taby = tabs
        else:
            relx_f = flat(relx)                              # [1, TGL] i32
            rely_f = flat(rely)
            zeros4 = jnp.zeros((4, TGL), jnp.float32)
            if "packgather" in variants:
                # One packed table instead of two: (q1+128)*256 + (q2+128)
                # in [0, 65535], exact in f32; the zero rows pack to
                # 128*256 + 128 = 32896 (q1 = q2 = 0).
                tabp = jnp.concatenate(
                    [flat((q1 + 128.0) * 256.0 + (q2 + 128.0))
                     for q1, q2 in zip(q1s, q2s)]
                    + [jnp.full((4, TGL), 32896.0, jnp.float32)], axis=0)
                tab1 = tab2 = None
            else:
                tab1 = jnp.concatenate(
                    [flat(q) for q in q1s] + [zeros4], axis=0)   # [8, TGL]
                tab2 = jnp.concatenate(
                    [flat(q) for q in q2s] + [zeros4], axis=0)
            taby = jnp.concatenate(
                [flat(w) for w in wys] + [zeros4], axis=0)

        # --- banded selectors via single-vreg-table dynamic_gather --------
        # Row index 4..7 of each table is zero: out-of-band dx (including
        # black-zone garbage bases) selects an exactly-zero weight. The
        # clamp is 3 signed ops (Mosaic has no minui): dm >= 4 pins to row 4,
        # dm < 0 pins to -1 whose low bits select row 7 — both zero rows.
        four = jnp.int32(4)
        neg1 = jnp.int32(-1)
        seven = jnp.int32(7)

        def gather_rows(tab, dm, rows):
            idx = jnp.maximum(jnp.minimum(dm, four), neg1) & seven
            return jnp.concatenate(
                [jnp.take_along_axis(tab, idx[s * 8:(s + 1) * 8], axis=0)
                 for s in range(rows // 8)], axis=0)

        if "build" in _ABLATE:
            sb = relx_f + tab1[0:1].astype(jnp.int32) \
                + tab2[0:1].astype(jnp.int32)
            w1 = (lax.broadcasted_iota(jnp.int32, (bwp, TGL), 0)
                  + sb).astype(jnp.int8)
            w2 = w1
            w_y = lax.broadcasted_iota(
                jnp.int32, (bh_al, TGL), 0).astype(jnp.float32) \
                + taby[0:1] + rely_f.astype(jnp.float32)
        else:
            dxm = lax.broadcasted_iota(jnp.int32, (bwp, TGL), 0) - relx_f
            if "packgather" in variants:
                pi = gather_rows(tabp, dxm, bwp).astype(jnp.int32)
                w1 = ((pi >> 8) - 128).astype(jnp.int8)
                w2 = ((pi & 255) - 128).astype(jnp.int8)
            else:
                w1 = gather_rows(tab1, dxm, bwp).astype(jnp.int32).astype(jnp.int8)
                w2 = gather_rows(tab2, dxm, bwp).astype(jnp.int32).astype(jnp.int8)
            dym = lax.broadcasted_iota(jnp.int32, (bh_al, TGL), 0) - rely_f
            w_y = gather_rows(taby, dym, bh_al)              # [BH, TGL] f32

        for cp in copies_for(s, slot):
            cp.wait()

        # Shared across channels: rw[g, l] = sum_h w_y — carries the corr
        # term (and exact zeros for the black zone) past the y-reduce.
        if "ydot" in variants:
            ones_bh = jnp.ones((1, bh_al), jnp.float32)

            def col_sums(m, ng):
                # [BH, ng*L] -> [ng, L]: one ones-vector MXU dot reduces
                # all columns at once; the [1, ng*L] row is then
                # unflattened by sublane-concat of its 128-lane slices
                # (each slice starts at a lane multiple of 128, so offsets
                # match).
                ssum = lax.dot_general(
                    ones_bh, m, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                            # [1, ng*L]
                return jnp.concatenate(
                    [ssum[:, gg * L:(gg + 1) * L] for gg in range(ng)],
                    axis=0)
        else:
            def col_sums(m, ng):
                # [BH, ng*L] -> [ng, L] per-column-group sums.
                rows = [
                    jnp.sum(m[:, gg * L:(gg + 1) * L], axis=0, keepdims=True)
                    for gg in range(ng)
                ]
                return jnp.concatenate(rows, axis=0)

        rw = col_sums(w_y, TG)                               # [TG, L] f32

        outs = []
        for c in range(nch):
            tiles = []
            for i in range(T):
                if shared:
                    # Slice tile i's rows out of the step's union block
                    # (both starts are 8-aligned by construction) and
                    # re-origin lanes at its true sx with the roll.
                    ry = pl.multiple_of(sy_ref[ts[i]] - syst_ref[s], 8)
                    dl = sxa_ref[ts[i]] + ds_[i] - sxst_ref[s]
                    raw = blk[slot, c, pl.ds(ry, bh_al), :]
                    rolled = pltpu.roll(
                        raw.astype(jnp.int32), -dl, 1)[:, :bwp]
                else:
                    rolled = pltpu.roll(
                        blk[slot, i, c].astype(jnp.int32), -ds_[i], 1)[:, :bwp]
                bi8 = (rolled - 128).astype(jnp.int8)        # exact shift
                w1_i = w1[:, i * GL:(i + 1) * GL]
                w2_i = w2[:, i * GL:(i + 1) * GL]
                if "dots" in _ABLATE:
                    h1 = (bi8.astype(jnp.int32)[:, 0:1]
                          + w1_i.astype(jnp.int32)[0:1, :])
                    h2 = h1
                else:
                    h1 = lax.dot_general(
                        bi8, w1_i, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    h2 = h1 if "dot2" in _ABLATE else lax.dot_general(
                        bi8, w2_i, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                # w = (q1*128 + q2)/8192, so h = h1<<7 + h2 is the EXACT
                # 8192-scaled x-resample of (pix - 128); scale and the
                # +128 correction are linear in w_y, so both move past the
                # reduce: out = sum_h wy*(h/8192 + 128*csum)
                #             = (sum wy*h)/8192 + corr*rw
                # ... with corr folded per-column after the reduce (corr
                # is constant down each column).
                h = (h1 << 7) + h2                           # [BH, GL] i32
                w_y_i = w_y[:, i * GL:(i + 1) * GL]
                corr_i = corr[i * G:(i + 1) * G]
                rw_i = rw[i * G:(i + 1) * G]
                if "ystage" in _ABLATE:
                    acc = (h[0:G, 0:L].astype(jnp.float32)
                           + w_y_i[0:G, 0:L] + corr_i * rw_i)
                else:
                    prod = h.astype(jnp.float32) * w_y_i
                    acc = col_sums(prod, G) * jnp.float32(_INV2) \
                        + corr_i * rw_i
                acc = jnp.where(acc < 0.0, 0.0, acc)
                acc = jnp.where(acc >= 256.0, 255.0, acc)
                # (int) truncation as in the C (:781); edge/outside exact.
                tiles.append(acc.astype(jnp.int32).astype(jnp.uint8))
            outs.append(
                (tiles[0] if T == 1 else jnp.concatenate(tiles, axis=0))[None]
            )
        result = jnp.concatenate(outs, axis=0)               # [C, TG, L]

        if not outdma_scratch:
            out_ref[...] = result
            return

        # --- "outdma" variant: manual double-buffered output write DMA ---
        # out_ref lives in ANY (HBM); the result is staged in VMEM and
        # copied out asynchronously so the write overlaps the next steps'
        # compute explicitly (A/B vs the pipeline emitter's own handling).
        out_buf, osem = outdma_scratch
        oslot = lax.rem(s, 2)

        def out_copy(ss, sl):
            row0 = (ss // n_k) * TG
            col0 = lax.rem(ss, n_k) * L
            return pltpu.make_async_copy(
                out_buf.at[sl],
                out_ref.at[:, pl.ds(row0, TG), pl.ds(col0, L)],
                osem.at[sl],
            )

        @pl.when(s >= 2)
        def _():
            out_copy(s - 2, oslot).wait()  # buffer reuse: 2-step-old write

        out_buf[oslot] = result
        out_copy(s, oslot).start()

        @pl.when(s == n_steps - 1)
        def _():
            if n_steps >= 2:
                out_copy(s - 1, lax.rem(s - 1, 2)).wait()
            out_copy(s, oslot).wait()

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(n_g2, n_k, bh_al, bwp, bwc, width, height, xc, yc, nch,
                interpret, G, L, variants: frozenset = frozenset(),
                T: int = 1, n_slots: int = 2,
                bh_T: int = 0, bwc_T: int = 0):
    """``n_g2`` counts GRID STEPS in g (the plan's row-group count padded
    to a T multiple, divided by T). ``bh_T``/``bwc_T`` size the shared
    union block for the "sharedblk" variant."""
    TG = T * G
    kernel = _make_kernel(
        n_k, n_g2 * n_k, bh_al, bwp, width, height, xc, yc, nch, G, L,
        variants, T=T, n_slots=n_slots)
    ax_spec = pl.BlockSpec((1, 1, L), lambda g, k, *_: (k, 0, 0),
                           memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, TG, 1), lambda g, k, *_: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    outdma = "outdma" in variants
    if "sharedblk" in variants:
        scratch = [
            pltpu.VMEM((n_slots, nch, bh_T, bwc_T), jnp.uint8),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ]
    else:
        scratch = [
            pltpu.VMEM((n_slots, T, nch, bh_al, bwc), jnp.uint8),
            pltpu.SemaphoreType.DMA((n_slots, T)),
        ]
    if outdma:
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [
            pltpu.VMEM((2, nch, TG, L), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        out_spec = pl.BlockSpec((nch, TG, L), lambda g, k, *_: (0, g, k),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_g2, n_k),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [ax_spec] * 4 + [b_spec] * 4,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nch, n_g2 * TG, n_k * L), jnp.uint8),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def pallas_profitable(height: int, width: int, angle: float) -> bool:
    """True when the kernel is expected to BEAT the XLA blocked path.

    Measured across angle regimes at 4K (same-run): bwp=128 plans win
    (1.02-1.12x: 57.1 vs 58.4 ms at 30deg, 63.8 vs 71.3 at 60deg, 47.2 vs
    48.7 at 100deg) but bwp=256 wide-block plans LOSE (0.85x: 51.1 vs
    43.5 ms at 170deg — the doubled dot K is mostly zero rows). The
    dispatch only routes here for fitting, narrow-block geometries.
    """
    gl = (_tuned_pallas_gl(float(angle))
          if height * width >= 1_500_000 else None) or (_TILE_G, _TILE_L)
    plan = _pallas_plan(height, width, float(angle), *gl)
    if plan is None or plan[3] != 128:
        return False
    # The per-angle tuning table (tools/rotate_autotune.py) can veto a
    # bucket where the probe showed the kernel losing to tuned XLA.
    table = _g._load_rotation_tuning()
    if table:
        ent = table.get("buckets", {}).get(_g._tuning_bucket(angle))
        if ent and ent.get("pallas_ok") is False:
            return False
    return True


def _tuned_pallas_gl(angle: float):
    """Per-angle-bucket (G, L) for the KERNEL from rotate_tuning.json's v2
    ``pallas`` sub-entries (tools/rotate_tune_rank.py), or None for the
    static defaults. TPU-only, like `geometry._tuned_gl` (hardware probe)."""
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return None
    table = _g._load_rotation_tuning()
    if not table:
        return None
    ent = table.get("buckets", {}).get(_g._tuning_bucket(angle))
    p = ent.get("pallas") if ent else None
    if not p:
        return None
    return int(p["G"]), int(p["L"])


def rotate_blocked_pallas(img, angle: float, interpret: bool | None = None,
                          tiles_per_step: int | None = None,
                          n_slots: int | None = None,
                          variants: frozenset | None = None,
                          G: int | None = None, L: int | None = None):
    """Pallas form of the blocked rotation; None if the plan doesn't fit.

    Output matches `geometry.rotate` semantics: zones and edge/outside
    pixels exact, interior +-1 LSB vs the f64 golden.

    ``tiles_per_step``/``n_slots``/``variants``/``G``/``L`` override the
    shipped skeleton configuration (defaults `_TILE_T`/`_N_SLOTS`/
    `_VARIANTS`/the tuned table falling back to `_TILE_G`x`_TILE_L`) for
    the A/B harness.
    """
    height, width = img.shape[0], img.shape[1]
    if G is None or L is None:
        tuned = (_tuned_pallas_gl(float(angle))
                 if height * width >= 1_500_000 else None)
        G, L = tuned if tuned is not None else (_TILE_G, _TILE_L)
    T = _TILE_T if tiles_per_step is None else int(tiles_per_step)
    slots = _N_SLOTS if n_slots is None else int(n_slots)
    var = _VARIANTS if variants is None else variants
    plan = _pallas_plan(height, width, float(angle), G, L)
    if plan is None:
        return None
    (new_h, new_w, bh_al, bwp, bwc, n_g, n_k, splits,
     sy_al, sx_al, d, xc, yc, h_pad, w_pad) = plan
    squeeze = img.ndim == 2
    img = jnp.asarray(img)
    if squeeze:
        img = img[:, :, None]
    nch = img.shape[2]

    planes = jnp.stack([img[:, :, c] for c in range(nch)], axis=0)
    if h_pad != height or w_pad != width:
        planes = jnp.pad(
            planes, ((0, 0), (0, h_pad - height), (0, w_pad - width)))

    (axh, axl), (bxh, bxl), (ayh, ayl), (byh, byl) = splits
    # Pad the row-group axis to a T multiple (repeat the last group's
    # geometry; padded output rows fall past new_h and are cropped).
    n_gp = _round_up(n_g, T)
    if n_gp != n_g:
        pad = n_gp - n_g

        def pad_groups(a, shape):
            a = a.reshape(n_g, *shape)
            return np.concatenate(
                [a, np.repeat(a[-1:], pad, axis=0)], axis=0)

        sy_al = pad_groups(sy_al, (n_k,)).reshape(-1)
        sx_al = pad_groups(sx_al, (n_k,)).reshape(-1)
        d = pad_groups(d, (n_k,)).reshape(-1)
        bxh, bxl = pad_groups(bxh, (G,)), pad_groups(bxl, (G,))
        byh, byl = pad_groups(byh, (G,)), pad_groups(byl, (G,))
    n_g2 = n_gp // T
    bh_T = bwc_T = 0
    if "sharedblk" in var:
        # Host plan for the per-step UNION blocks (one DMA per step).
        sy_t = sy_al.reshape(n_g2, T, n_k)
        sx_t = sx_al.reshape(n_g2, T, n_k)
        sxr = sx_t + d.reshape(n_g2, T, n_k)                 # true sx
        syst = sy_t.min(axis=1)                              # [n_g2, n_k]
        bh_T = _round_up(int((sy_t.max(axis=1) - syst).max()) + bh_al, 8)
        sxst = sx_t.min(axis=1)
        need_w = int((sxr.max(axis=1) - sxst).max()) + bwp + 4
        bwc_T = 256 if need_w <= 256 else 512
        if need_w > 512 or h_pad < bh_T or w_pad < bwc_T:
            return None  # geometry too spread for a shared block
        syst = np.minimum(syst, h_pad - bh_T).astype(np.int32)
        sxst = np.minimum(sxst, w_pad - bwc_T).astype(np.int32)
        syst_f = syst.reshape(-1)
        sxst_f = sxst.reshape(-1)
    else:
        syst_f = np.zeros(1, np.int32)
        sxst_f = np.zeros(1, np.int32)
    call = _build_call(
        n_g2, n_k, bh_al, bwp, bwc, width, height, xc, yc, nch,
        _interpret() if interpret is None else interpret,
        G, L, var, T, slots, bh_T, bwc_T,
    )
    TG = T * G
    out = call(
        jnp.asarray(sy_al), jnp.asarray(sx_al), jnp.asarray(d),
        jnp.asarray(syst_f), jnp.asarray(sxst_f),
        planes,
        jnp.asarray(axh.reshape(n_k, 1, L)), jnp.asarray(axl.reshape(n_k, 1, L)),
        jnp.asarray(ayh.reshape(n_k, 1, L)), jnp.asarray(ayl.reshape(n_k, 1, L)),
        jnp.asarray(bxh.reshape(n_g2, TG, 1)), jnp.asarray(bxl.reshape(n_g2, TG, 1)),
        jnp.asarray(byh.reshape(n_g2, TG, 1)), jnp.asarray(byl.reshape(n_g2, TG, 1)),
    )
    if not (_interpret() if interpret is None else interpret):
        # The dispatch above compiled (or cache-reloaded) the Mosaic
        # program without raising: record the paid compile so future
        # processes auto-route here (geometry.rotate's cache-aware
        # dispatch) instead of requiring IPT_PALLAS_ROTATE=1.
        memo = (height, width, float(angle))
        if memo not in _recorded:
            _recorded.add(memo)
            from imageprocessingtools_tpu.utils import kernel_manifest

            kernel_manifest.record_compile(
                "rotate_blocked", height, width, float(angle))
    out = jnp.stack([out[c, :new_h, :new_w] for c in range(nch)], axis=-1)
    return out[:, :, 0] if squeeze else out


_recorded: set = set()
