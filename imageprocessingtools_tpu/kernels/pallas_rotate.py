"""Pallas TPU kernel for the blocked arbitrary-angle rotation.

Same semantics as `ops.geometry._rotate_apply_blocked` (the gather-free
re-expression of ``ppmx-edward.c:727-785``: output tiled G x L, per-tile
source block, zone-folded banded tap weights), with the whole per-tile
dataflow kept in VMEM:

- one aligned DMA per tile pulls the uint8 source block HBM -> VMEM
  (row start 8-aligned, column start 128-aligned; a dynamic `pltpu.roll`
  re-centers lanes so the matmul contraction stays at BWP lanes);
- the zone/tap decisions run in-kernel on [1, L] rows with the SAME
  double-f32 helpers as the XLA path (`geometry._zone_taps`);
- the x-resample runs as TWO int8 MXU matmuls with int32 accumulation:
  tap weights are quantized to w ~= q1/64 + q2/8192 (both int8; scales are
  powers of two so the edge band's one-hot weights reconstruct EXACTLY and
  nearest-neighbor pixels stay bit-exact). Interior weight error is
  <= 2^-14 per tap -> < 0.08 LSB on the pixel value, well inside the
  documented +-1 budget (tighter than the XLA path's Precision.HIGH);
- the y-combine is an f32 VPU multiply + sublane reduction, identical in
  structure to the XLA path.

Unlike the XLA formulation - whose measured ~52 ms structural floor at
4K/30deg is per-tile dynamic_slice + [C, BH, P] intermediate traffic - no
intermediate ever touches HBM here; per tile the only HBM traffic is the
uint8 block read and the uint8 tile write.

The kernel compiles per (H, W, angle) like the XLA path. Images whose
plan doesn't fit (see `_pallas_fit`) fall back to the XLA path.
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

# Temporary ablation knob for on-chip cost attribution (see PROGRESS).
# Members: "geom" (skip zone/tap geometry), "build" (skip selector builds),
# "dot2" (skip second int8 pass), "dot1" (skip both dots).
_ABLATE: frozenset = frozenset()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=32)
def _pallas_plan(height: int, width: int, angle: float):
    """Host-side plan: the XLA blocked plan + DMA alignment. None if unfit."""
    plan = _g._blocked_plan(height, width, angle)
    if plan is None:
        return None
    new_h, new_w, bh, bw, n_g, n_k, splits, sy, sx, xc, yc = plan
    bwp = 128 if bw <= 128 else 256       # matmul K (post-roll lanes)
    if bw > bwp:
        return None
    bwc = bwp + 128                       # DMA width (128-aligned offset)
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


def _make_kernel(n_k, bh_al, bwp, width, height, xc, yc, nch, G, L):
    GL = G * L

    def kernel(sy_ref, sxa_ref, d_ref,
               planes_ref, axh_ref, axl_ref, ayh_ref, ayl_ref,
               bxh_ref, bxl_ref, byh_ref, byl_ref,
               out_ref, blk, sem):
        g = pl.program_id(0)
        k = pl.program_id(1)
        t = g * n_k + k
        sy = pl.multiple_of(sy_ref[t], 8)
        sxa = pl.multiple_of(sxa_ref[t], 128)
        d = d_ref[t]
        bwc = blk.shape[2]
        pltpu.make_async_copy(
            planes_ref.at[:, pl.ds(sy, bh_al), pl.ds(sxa, bwc)], blk, sem,
        ).start()

        # --- per-output-row geometry on [1, L] (same helpers as XLA path) --
        axh = axh_ref[0]
        axl = axl_ref[0]
        ayh = ayh_ref[0]
        ayl = ayl_ref[0]
        sx = sxa + d
        relx_parts, rely_parts = [], []
        wx_parts = [[] for _ in range(4)]
        wy_parts = [[] for _ in range(4)]
        if "geom" in _ABLATE:
            fake_i = jnp.full((1, L), 1, jnp.int32)
            fake_f = jnp.full((1, L), 0.25, jnp.float32)
            for gg in range(G):
                relx_parts.append(fake_i + bxh_ref[0, 0, gg].astype(jnp.int32))
                rely_parts.append(fake_i)
                for tap in range(4):
                    wx_parts[tap].append(fake_f)
                    wy_parts[tap].append(fake_f)
        else:
            for gg in range(G):
                base_x, base_y, wxs, wys = _g._zone_taps(
                    (axh, axl), (bxh_ref[0, 0, gg], bxl_ref[0, 0, gg]),
                    (ayh, ayl), (byh_ref[0, 0, gg], byl_ref[0, 0, gg]),
                    xc, yc, width, height,
                )
                relx_parts.append(base_x - sx)
                rely_parts.append(base_y - sy)
                for tap in range(4):
                    wx_parts[tap].append(wxs[tap])
                    wy_parts[tap].append(wys[tap])

        relx = jnp.concatenate(relx_parts, axis=1)           # [1, GL] i32
        rely = jnp.concatenate(rely_parts, axis=1)
        wx_t = [jnp.concatenate(p, axis=1) for p in wx_parts]  # 4 x [1, GL]
        wy_t = [jnp.concatenate(p, axis=1) for p in wy_parts]

        # --- power-of-two int8 quantization of the x tap weights ----------
        q1_t, q2_t = [], []
        for tap in range(4):
            q1 = jnp.floor(wx_t[tap] * _S1 + 0.5)
            q2 = jnp.floor((wx_t[tap] - q1 * _INV1) * _S2 + 0.5)
            q1_t.append(q1)
            q2_t.append(q2)
        cs1 = q1_t[0] + q1_t[1] + q1_t[2] + q1_t[3]          # [1, GL] f32
        cs2 = q2_t[0] + q2_t[1] + q2_t[2] + q2_t[3]
        corr = 128.0 * (cs1 * _INV1 + cs2 * _INV2)           # [1, GL] f32

        if "build" in _ABLATE:
            seed = (relx + rely).astype(jnp.float32) + q1_t[0] + q2_t[0]
            w1 = (lax.broadcasted_iota(jnp.int32, (bwp, GL), 0)
                  + seed.astype(jnp.int32)).astype(jnp.int8)
            w2 = w1
            w_y = (lax.broadcasted_iota(jnp.int32, (bh_al, GL), 0)
                   .astype(jnp.float32) + seed)
        else:
            dx = lax.broadcasted_iota(jnp.int32, (bwp, GL), 0) - relx
            zero_i = jnp.int32(0)
            w1 = sum(
                jnp.where(dx == tap, q1_t[tap].astype(jnp.int32), zero_i)
                for tap in range(4)
            ).astype(jnp.int8)                                   # [BWP, GL]
            w2 = sum(
                jnp.where(dx == tap, q2_t[tap].astype(jnp.int32), zero_i)
                for tap in range(4)
            ).astype(jnp.int8)

            dy = lax.broadcasted_iota(jnp.int32, (bh_al, GL), 0) - rely
            zero_f = jnp.float32(0.0)
            w_y = sum(
                jnp.where(dy == tap, wy_t[tap], zero_f) for tap in range(4)
            )                                                    # [BH, GL] f32

        pltpu.make_async_copy(
            planes_ref.at[:, pl.ds(sy, bh_al), pl.ds(sxa, bwc)], blk, sem,
        ).wait()

        outs = []
        for c in range(nch):
            rolled = pltpu.roll(blk[c].astype(jnp.int32), -d, 1)[:, :bwp]
            bi8 = (rolled - 128).astype(jnp.int8)            # exact shift
            if "dot1" in _ABLATE:
                h1 = (bi8.astype(jnp.int32)[:, :1] + jnp.zeros((1, GL), jnp.int32))
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
            xf = h1.astype(jnp.float32) * _INV1 \
                + h2.astype(jnp.float32) * _INV2 + corr      # [BH, GL]
            prod = xf * w_y
            rows = [
                jnp.sum(prod[:, gg * L:(gg + 1) * L], axis=0, keepdims=True)
                for gg in range(G)
            ]
            acc = jnp.concatenate(rows, axis=0)              # [G, L] f32
            acc = jnp.where(acc < 0.0, 0.0, acc)
            acc = jnp.where(acc >= 256.0, 255.0, acc)
            # (int) truncation as in the C (:781); edge/outside are exact.
            outs.append(acc.astype(jnp.int32).astype(jnp.uint8)[None])
        out_ref[...] = jnp.concatenate(outs, axis=0)         # [C, G, L]

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(n_g, n_k, bh_al, bwp, bwc, width, height, xc, yc, nch,
                h_pad, w_pad, interpret):
    G, L = _g._BLOCK_G, _g._BLOCK_L
    kernel = _make_kernel(n_k, bh_al, bwp, width, height, xc, yc, nch, G, L)
    ax_spec = pl.BlockSpec((1, 1, L), lambda g, k, *_: (k, 0, 0),
                           memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, 1, G), lambda g, k, *_: (g, 0, 0),
                          memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_g, n_k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [ax_spec] * 4 + [b_spec] * 4,
        out_specs=pl.BlockSpec((nch, G, L), lambda g, k, *_: (0, g, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nch, bh_al, bwc), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nch, n_g * G, n_k * L), jnp.uint8),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def rotate_blocked_pallas(img, angle: float, interpret: bool | None = None):
    """Pallas form of the blocked rotation; None if the plan doesn't fit.

    Output matches `geometry.rotate` semantics: zones and edge/outside
    pixels exact, interior +-1 LSB vs the f64 golden.
    """
    height, width = img.shape[0], img.shape[1]
    plan = _pallas_plan(height, width, float(angle))
    if plan is None:
        return None
    (new_h, new_w, bh_al, bwp, bwc, n_g, n_k, splits,
     sy_al, sx_al, d, xc, yc, h_pad, w_pad) = plan
    squeeze = img.ndim == 2
    img = jnp.asarray(img)
    if squeeze:
        img = img[:, :, None]
    nch = img.shape[2]
    G, L = _g._BLOCK_G, _g._BLOCK_L

    planes = jnp.stack([img[:, :, c] for c in range(nch)], axis=0)
    if h_pad != height or w_pad != width:
        planes = jnp.pad(
            planes, ((0, 0), (0, h_pad - height), (0, w_pad - width)))

    (axh, axl), (bxh, bxl), (ayh, ayl), (byh, byl) = splits
    call = _build_call(
        n_g, n_k, bh_al, bwp, bwc, width, height, xc, yc, nch,
        h_pad, w_pad,
        _interpret() if interpret is None else interpret,
    )
    out = call(
        jnp.asarray(sy_al), jnp.asarray(sx_al), jnp.asarray(d),
        planes,
        jnp.asarray(axh.reshape(n_k, 1, L)), jnp.asarray(axl.reshape(n_k, 1, L)),
        jnp.asarray(ayh.reshape(n_k, 1, L)), jnp.asarray(ayl.reshape(n_k, 1, L)),
        jnp.asarray(bxh.reshape(n_g, 1, G)), jnp.asarray(bxl.reshape(n_g, 1, G)),
        jnp.asarray(byh.reshape(n_g, 1, G)), jnp.asarray(byl.reshape(n_g, 1, G)),
    )
    out = jnp.stack([out[c, :new_h, :new_w] for c in range(nch)], axis=-1)
    return out[:, :, 0] if squeeze else out
