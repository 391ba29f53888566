from imageprocessingtools_tpu.codec.ppm import (  # noqa: F401
    PPMError,
    decode_ppm,
    encode_ppm,
    read_ppm,
    write_ppm,
    FILETYPE_PPM,
    FILETYPE_PGM,
    FILETYPE_PBM,
)
