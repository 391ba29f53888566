"""Batch (data-parallel) API: vmap + sharding over a device mesh.

The reference processes one image per process; here a uint8[N, H, W, C] batch
is sharded over the mesh's data axis and each device runs the vmapped
pipeline on its slice — pure DP, no cross-image communication, so throughput
scales linearly over ICI-connected chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh(axis_name: str = "data", devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def batch_apply(fn, images: jnp.ndarray, mesh: Mesh | None = None, axis_name: str = "data"):
    """Apply a single-image op/pipeline to a batch, sharded over the mesh.

    ``fn``: traceable uint8[H, W, C] -> array. ``images``: uint8[N, H, W, C]
    with N divisible by the mesh axis size (pad-and-bucket upstream).
    """
    if mesh is None:
        mesh = default_mesh(axis_name)
    if axis_name not in mesh.shape:
        if len(mesh.shape) == 1:
            axis_name = next(iter(mesh.shape))  # 1-D mesh: use its axis name
        else:
            raise ValueError(
                f"axis_name {axis_name!r} not in mesh axes {tuple(mesh.shape)}"
            )
    n_dev = mesh.shape[axis_name]
    if images.shape[0] % n_dev != 0:
        raise ValueError(
            f"batch size {images.shape[0]} not divisible by mesh axis "
            f"{axis_name}={n_dev}; pad the batch"
        )
    # NO explicit device_put: uint8[..., W, 3] arrays tile-pad ~42x on HBM
    # ((8, 128) on the (W, 3) minor dims) when committed via device_put,
    # while jit ARGUMENTS pick compact layouts (CLAUDE.md) — the jit's
    # in_shardings places the host batch correctly and compactly.
    return _jitted_vmap(fn, mesh, axis_name)(images)


@functools.lru_cache(maxsize=128)
def _jitted_vmap(fn, mesh: Mesh, axis_name: str):
    """Cache the jitted vmap per (fn, mesh, axis): jax.jit caches by function
    identity, so rebuilding the wrapper per call would recompile every chunk
    (~0.6-2 s each through the TPU tunnel)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.jit(jax.vmap(fn), in_shardings=sharding, out_shardings=sharding)


@functools.lru_cache(maxsize=32)
def _shard_mapped_vmap(fn, mesh: Mesh, axis_name: str):
    """vmap(fn) under shard_map over the batch axis (MANUAL partitioning).

    A Pallas kernel lowers to an opaque custom call that GSPMD's automatic
    partitioner cannot split, so the mega-kernel batch path must be
    manually sharded: each device runs the vmapped kernel on its LOCAL
    batch shard (per-image work only — no cross-image communication, so
    out_specs need no collective). jit-of-shard_map keeps the dispatch
    cached like `_jitted_vmap`.
    """
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax only has the experimental spelling
        from jax.experimental.shard_map import shard_map

    spec = P(axis_name)
    try:
        # pallas_call can't express the varying-mesh-axes annotation the
        # vma checker wants on its out_shape; the body is per-shard-local
        # with no collectives, so disabling the check is sound.
        sm = shard_map(
            jax.vmap(fn), mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        )
    except TypeError:  # older jax spells it check_rep
        sm = shard_map(
            jax.vmap(fn), mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_rep=False,
        )
    return jax.jit(sm)


def batched_fused_pipeline(images, mesh: Mesh | None = None, axis_name: str = "data"):
    """Sharded batched flagship pipeline: uint8[N,H,W,3] -> uint8[N,H,W].

    On a TPU mesh with >= 512^2-px images the vmapped Pallas mega kernel
    carries the batch (bit-identical). Round-4 gate rework
    (BATCH_MEGA_r04.json, 10 interleaved hardware rounds per shape with
    the post-MEGA_TUNE kernel): mega wins 0.29x at 4000x3000 b=2 (10/10),
    0.35x at 1366x768 b=4 (8/10), 0.75x at 1080p b=4 (10/10), and 6/10 at
    512^2 b=8 — so the old 2 MPix floor (from the pre-tune kernel) drops
    to the measured 512^2 floor, the W % 128 == 0 gate is gone (in-kernel
    lane masking), and multi-device meshes run the kernel under shard_map
    (each device's local batch shard — GSPMD cannot split the opaque
    Pallas custom call, so manual partitioning is the correct multi-chip
    form; validated on the 8-virtual-device mesh, bit-identical).
    """
    from imageprocessingtools_tpu.kernels.fused import (
        fused_pipeline_pallas_mega,
        fused_pipeline_xla,
    )

    if mesh is None:
        mesh = default_mesh(axis_name)
    n_dev = len(np.asarray(mesh.devices).ravel())
    h, w = int(images.shape[1]), int(images.shape[2])
    use_mega = (
        jax.default_backend() == "tpu"
        and h * w >= 512 * 512
        and h * w < 2**24
        and h >= 8
        and images.shape[0] % max(n_dev, 1) == 0
    )
    if use_mega and n_dev > 1:
        if axis_name not in mesh.shape and len(mesh.shape) == 1:
            axis_name = next(iter(mesh.shape))
        return _shard_mapped_vmap(
            fused_pipeline_pallas_mega, mesh, axis_name)(images)
    fn = fused_pipeline_pallas_mega if use_mega else fused_pipeline_xla
    return batch_apply(fn, images, mesh=mesh, axis_name=axis_name)
