"""Fixed-order op pipeline mirroring the reference driver.

The reference applies ops in a FIXED order regardless of CLI order
(``ppmx-edward.c:1084-1155``): resize -> rotate -> gray -> mono -> flip-v ->
flip-h, swapping buffers between stages.

Intentional divergence (bug B1, documented): in the reference, a flip
combined with -gray/-mono clobbers the gray/mono result with the color
buffer's red channel (``ppmx-edward.c:896`` aliasing + the guard at
``:1147-1155``). This pipeline implements the obviously-intended compose:
flips apply to the gray/mono output.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from imageprocessingtools_tpu import ops
from imageprocessingtools_tpu.codec.ppm import FILETYPE_PBM, FILETYPE_PGM, FILETYPE_PPM


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """The reference's six-flag surface (``ppmx-edward.c:59-66``)."""

    new_width: int | None = None   # -wN
    angle: float | None = None     # -rN (reference CLI: integer 0..359)
    gray: bool = False             # -gray (conflicts with mono)
    mono: bool = False             # -mono (conflicts with gray)
    flip_v: bool = False           # -fv (conflicts with fh)
    flip_h: bool = False           # -fh (conflicts with fv)

    def __post_init__(self):
        if self.gray and self.mono:
            raise ValueError("Error: Conflicting options not allowed\n")
        if self.flip_v and self.flip_h:
            raise ValueError("Error: Conflicting options not allowed\n")

    @property
    def any_op(self) -> bool:
        return (
            self.new_width is not None
            or self.angle is not None
            or self.gray
            or self.mono
            or self.flip_v
            or self.flip_h
        )

    @property
    def file_type(self) -> int:
        if self.gray:
            return FILETYPE_PGM
        if self.mono:
            return FILETYPE_PBM
        return FILETYPE_PPM


def run_pipeline(
    img, config: PipelineConfig, strict_rotation: bool = False
) -> tuple[jnp.ndarray, int]:
    """Apply the fixed-order pipeline; returns (result, file_type).

    ``img`` is uint8[H, W, 3] (numpy or jax). Raises ValueError with the
    reference's message when no op is requested (quirk B2: the reference
    errors with "no data to write").

    ``strict_rotation=True`` (the CLI's eager path) runs the cached host
    audit `rotation_decisions_safe` on the rotation geometry and falls back
    to the bit-exact f64 host rotation if any zone/nearest decision is
    ambiguous at double-f32 precision. The audit cannot fall back under
    tracing (vmap/jit callers), so it is opt-in.
    """
    if not config.any_op:
        raise ValueError("Error: no data to write\n")
    out = jnp.asarray(img)
    if config.new_width is not None:
        out = ops.resize_width(out, int(config.new_width))
    if config.angle is not None:
        out = ops.rotate(out, float(config.angle), strict=strict_rotation)
    if config.gray:
        out = ops.grayscale(out)
    if config.mono:
        out = ops.mono_dither(out)
    if config.flip_v:
        out = ops.flip_vertical(out)
    if config.flip_h:
        out = ops.flip_horizontal(out)
    return out, config.file_type
