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
_VARIANTS: frozenset = frozenset({"packgather"})


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


def _make_kernel(n_k, n_tiles, bh_al, bwp, width, height, xc, yc, nch, G, L,
                 variants: frozenset = frozenset()):
    GL = G * L

    def kernel(sy_ref, sxa_ref, d_ref,
               planes_ref, axh_ref, axl_ref, ayh_ref, ayl_ref,
               bxh_ref, bxl_ref, byh_ref, byl_ref,
               out_ref, blk, sem):
        g = pl.program_id(0)
        k = pl.program_id(1)
        t = g * n_k + k
        slot = lax.rem(t, 2)
        bwc = blk.shape[3]

        def copy_for(tt, sl):
            syt = pl.multiple_of(sy_ref[tt], 8)
            sxt = pl.multiple_of(sxa_ref[tt], 128)
            return pltpu.make_async_copy(
                planes_ref.at[:, pl.ds(syt, bh_al), pl.ds(sxt, bwc)],
                blk.at[sl], sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            copy_for(0, 0).start()

        @pl.when(t + 1 < n_tiles)
        def _():
            copy_for(t + 1, 1 - slot).start()

        # --- whole-tile geometry on [G, L] (same helpers as XLA path) -----
        if "geom" in _ABLATE:
            fi = (lax.broadcasted_iota(jnp.int32, (G, L), 1)
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
                (bxh_ref[0], bxl_ref[0]),          # [G, 1]
                (ayh_ref[0], ayl_ref[0]),
                (byh_ref[0], byl_ref[0]),
                xc, yc, width, height,
            )
        d = d_ref[t]
        sx = sxa_ref[t] + d
        relx = base_x - sx                     # [G, L] i32
        rely = base_y - sy_ref[t]

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
            # [G, L] -> [1, G*L] by lane-concat of sublane rows (Mosaic has
            # no [G, L] -> [1, GL] shape cast). Each row is rolled to
            # sublane 0 first: tpu.concatenate requires matching sublane
            # offsets on the non-concat dim, and a bare v[gg:gg+1] slice
            # keeps offset {gg, 0}.
            return jnp.concatenate(
                [(pltpu.roll(v, G - gg, 0) if gg else v)[0:1, :]
                 for gg in range(G)], axis=1)

        if "flat" in _ABLATE:
            # [1, GL] data-dependent seed without sublane+lane broadcasts
            # (Mosaic can't broadcast [1, 1] into both dims).
            seed = jnp.concatenate(
                [relx[0:1, :] + rely[0:1, :]] * (GL // L), axis=1)
            relx_f = (lax.broadcasted_iota(jnp.int32, (1, GL), 1) % 64
                      + seed % 8)
            rely_f = relx_f % 32
            tabs = (lax.broadcasted_iota(jnp.int32, (8, GL), 1)
                    + seed).astype(jnp.float32) \
                + jnp.concatenate([corr[0:1, :]] * (GL // L), axis=1)
            tab1 = tab2 = taby = tabs
        else:
            relx_f = flat(relx)                              # [1, GL] i32
            rely_f = flat(rely)
            zeros4 = jnp.zeros((4, GL), jnp.float32)
            if "packgather" in variants:
                # One packed table instead of two: (q1+128)*256 + (q2+128)
                # in [0, 65535], exact in f32; the zero rows pack to
                # 128*256 + 128 = 32896 (q1 = q2 = 0).
                tabp = jnp.concatenate(
                    [flat((q1 + 128.0) * 256.0 + (q2 + 128.0))
                     for q1, q2 in zip(q1s, q2s)]
                    + [jnp.full((4, GL), 32896.0, jnp.float32)], axis=0)
                tab1 = tab2 = None
            else:
                tab1 = jnp.concatenate(
                    [flat(q) for q in q1s] + [zeros4], axis=0)   # [8, GL] f32
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
            w1 = (lax.broadcasted_iota(jnp.int32, (bwp, GL), 0)
                  + sb).astype(jnp.int8)
            w2 = w1
            w_y = lax.broadcasted_iota(
                jnp.int32, (bh_al, GL), 0).astype(jnp.float32) \
                + taby[0:1] + rely_f.astype(jnp.float32)
        else:
            dxm = lax.broadcasted_iota(jnp.int32, (bwp, GL), 0) - relx_f
            if "packgather" in variants:
                pi = gather_rows(tabp, dxm, bwp).astype(jnp.int32)
                w1 = ((pi >> 8) - 128).astype(jnp.int8)
                w2 = ((pi & 255) - 128).astype(jnp.int8)
            else:
                w1 = gather_rows(tab1, dxm, bwp).astype(jnp.int32).astype(jnp.int8)
                w2 = gather_rows(tab2, dxm, bwp).astype(jnp.int32).astype(jnp.int8)
            dym = lax.broadcasted_iota(jnp.int32, (bh_al, GL), 0) - rely_f
            w_y = gather_rows(taby, dym, bh_al)              # [BH, GL] f32

        copy_for(t, slot).wait()

        # Shared across channels: rw[g, l] = sum_h w_y — carries the corr
        # term (and exact zeros for the black zone) past the y-reduce.
        if "ydot" in variants:
            ones_bh = jnp.ones((1, bh_al), jnp.float32)

            def col_sums(m):
                # [BH, GL] -> [G, L]: one ones-vector MXU dot reduces all
                # GL columns at once; the [1, GL] row is then unflattened
                # by sublane-concat of its 128-lane slices (each slice
                # starts at a lane multiple of 128, so offsets match).
                s = lax.dot_general(
                    ones_bh, m, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                            # [1, GL]
                return jnp.concatenate(
                    [s[:, gg * L:(gg + 1) * L] for gg in range(G)], axis=0)
        else:
            def col_sums(m):
                # [BH, GL] -> [G, L] per-column-group sums.
                rows = [
                    jnp.sum(m[:, gg * L:(gg + 1) * L], axis=0, keepdims=True)
                    for gg in range(G)
                ]
                return jnp.concatenate(rows, axis=0)

        rw = col_sums(w_y)                                   # [G, L] f32

        outs = []
        for c in range(nch):
            rolled = pltpu.roll(blk[slot, c].astype(jnp.int32), -d, 1)[:, :bwp]
            bi8 = (rolled - 128).astype(jnp.int8)            # exact shift
            if "dots" in _ABLATE:
                h1 = (bi8.astype(jnp.int32)[:, 0:1]
                      + w1.astype(jnp.int32)[0:1, :])
                h2 = h1
            else:
                h1 = lax.dot_general(
                    bi8, w1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                h2 = h1 if "dot2" in _ABLATE else lax.dot_general(
                    bi8, w2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            # w = (q1*128 + q2)/8192, so h = h1<<7 + h2 is the EXACT
            # 8192-scaled x-resample of (pix - 128); scale and the +128
            # correction are linear in w_y, so both move past the reduce:
            # out = sum_h wy*(h/8192 + 128*csum) = (sum wy*h)/8192 + corr*rw
            # ... with corr folded per-column after the reduce (corr is
            # constant down each column).
            h = (h1 << 7) + h2                               # [BH, GL] i32
            if "ystage" in _ABLATE:
                acc = (h[0:G, 0:L].astype(jnp.float32)
                       + w_y[0:G, 0:L] + corr * rw)
            else:
                prod = h.astype(jnp.float32) * w_y
                acc = col_sums(prod) * jnp.float32(_INV2) + corr * rw
            acc = jnp.where(acc < 0.0, 0.0, acc)
            acc = jnp.where(acc >= 256.0, 255.0, acc)
            # (int) truncation as in the C (:781); edge/outside are exact.
            outs.append(acc.astype(jnp.int32).astype(jnp.uint8)[None])
        out_ref[...] = jnp.concatenate(outs, axis=0)         # [C, G, L]

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(n_g, n_k, bh_al, bwp, bwc, width, height, xc, yc, nch,
                interpret, G, L, variants: frozenset = frozenset()):
    kernel = _make_kernel(
        n_k, n_g * n_k, bh_al, bwp, width, height, xc, yc, nch, G, L,
        variants)
    ax_spec = pl.BlockSpec((1, 1, L), lambda g, k, *_: (k, 0, 0),
                           memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, G, 1), lambda g, k, *_: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_g, n_k),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [ax_spec] * 4 + [b_spec] * 4,
        out_specs=pl.BlockSpec((nch, G, L), lambda g, k, *_: (0, g, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nch, bh_al, bwc), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nch, n_g * G, n_k * L), jnp.uint8),
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
    plan = _pallas_plan(height, width, float(angle), _TILE_G, _TILE_L)
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


def rotate_blocked_pallas(img, angle: float, interpret: bool | None = None):
    """Pallas form of the blocked rotation; None if the plan doesn't fit.

    Output matches `geometry.rotate` semantics: zones and edge/outside
    pixels exact, interior +-1 LSB vs the f64 golden.
    """
    height, width = img.shape[0], img.shape[1]
    G, L = _TILE_G, _TILE_L
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
    call = _build_call(
        n_g, n_k, bh_al, bwp, bwc, width, height, xc, yc, nch,
        _interpret() if interpret is None else interpret,
        G, L, _VARIANTS,
    )
    out = call(
        jnp.asarray(sy_al), jnp.asarray(sx_al), jnp.asarray(d),
        planes,
        jnp.asarray(axh.reshape(n_k, 1, L)), jnp.asarray(axl.reshape(n_k, 1, L)),
        jnp.asarray(ayh.reshape(n_k, 1, L)), jnp.asarray(ayl.reshape(n_k, 1, L)),
        jnp.asarray(bxh.reshape(n_g, G, 1)), jnp.asarray(bxl.reshape(n_g, G, 1)),
        jnp.asarray(byh.reshape(n_g, G, 1)), jnp.asarray(byl.reshape(n_g, G, 1)),
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
