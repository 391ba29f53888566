from imageprocessingtools_tpu.utils.timing import (  # noqa: F401
    device_loop_rate,
    dispatch_time,
)
