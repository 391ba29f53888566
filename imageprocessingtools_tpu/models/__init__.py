"""Preset pipelines ("models"): named, jitted op compositions.

The reference has exactly one hard-wired pipeline (resize -> rotate -> gray
-> mono -> flips, ``ppmx-edward.c:1084-1155``); this module generalizes it to
reusable presets a serving deployment would ship. Each preset is a pure
``uint8[H, W, 3] -> uint8[...]`` callable, safe under jit/vmap/shard_map and
usable with `parallel.batch_apply` / `serving.process_batch`.
"""

from imageprocessingtools_tpu.models.presets import (  # noqa: F401
    PRESETS,
    PRESET_FILE_TYPES,
    get_preset,
    reference_pipeline,
    edge_detect,
    enhance,
    thumbnail,
    print_ready,
)
