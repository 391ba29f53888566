from imageprocessingtools_tpu.golden import model  # noqa: F401
