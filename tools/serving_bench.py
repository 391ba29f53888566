"""At-scale serving benchmark: BASELINE.md row 3 (batched decode->op->encode).

    python tools/serving_bench.py [--n 256] [--unique 32] [--dims 1080x1920]
                                  [--op gray] [--ab] [--max-batch 64]

Generates `--unique` distinct P6 files once (the path list cycles them to
reach `--n` logical images; per-image I/O volume is identical to distinct
files), then times `serving.process_files` end-to-end: header pass, chunked
native parallel decode, device pipeline, host encode — with the pipelined
reader/writer overlap.

IMPORTANT context for reading the numbers: this environment reaches its TPU
through a remote tunnel measured at ~5-15 MB/s each way (vs >= 16 GB/s for
a production host-attached chip), so the end-to-end figure here is
tunnel-transfer-bound, not compute- or codec-bound. The report therefore
also measures each component in isolation — tunnel bandwidth, host decode,
host encode, and resident-device pipeline rate — and derives the
production-bound estimate min(decode, device, encode) that a host-attached
deployment would see. The C reference (one image per process) measures
1.6 MPix/s end-to-end for -gray at 4K on this host (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from imageprocessingtools_tpu import serving
from imageprocessingtools_tpu.codec import native, ppm
from imageprocessingtools_tpu.pipeline import PipelineConfig

CONFIGS = {
    "gray": PipelineConfig(gray=True),
    "mono": PipelineConfig(mono=True),
    "gray_fh": PipelineConfig(gray=True, flip_h=True),
}


def _tunnel_bandwidth() -> dict:
    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(0).integers(0, 256, size=(2048, 8192), dtype=np.uint8)
    d = jax.device_put(x[:64])  # warm
    np.asarray(jnp.ravel(d)[:1])
    t0 = time.perf_counter()
    d = jax.device_put(x)
    np.asarray(jnp.ravel(d)[:1])
    up = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(d)
    down = time.perf_counter() - t0
    mb = x.nbytes / 1e6
    return {"up_mb_s": round(mb / up, 1), "down_mb_s": round(mb / down, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--unique", type=int, default=32)
    ap.add_argument("--dims", default="1080x1920")
    ap.add_argument("--mixed-dims", default=None,
                    help="second shape (HxW): adds --mixed-n files of it so "
                         "bucketing/recompile paths are exercised")
    ap.add_argument("--mixed-n", type=int, default=0)
    ap.add_argument("--op", default="gray", choices=sorted(CONFIGS))
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--ab", action="store_true",
                    help="also time overlap=False on n/4 images")
    ap.add_argument("--components-only", action="store_true",
                    help="measure the component rates (tunnel, decode, "
                         "encode, device pipeline) and skip the "
                         "tunnel-bound end-to-end run")
    ap.add_argument("--workdir", default="/tmp/serving_bench")
    args = ap.parse_args()

    h, w = (int(t) for t in args.dims.split("x"))
    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(0)

    def gen_files(hh, ww, count):
        out = []
        for i in range(count):
            p = os.path.join(args.workdir, f"img_{hh}x{ww}_{i:04d}.ppm")
            if not os.path.exists(p):
                with open(p, "wb") as f:
                    f.write(ppm.encode_ppm(
                        rng.integers(0, 256, size=(hh, ww, 3), dtype=np.uint8)))
            out.append(p)
        return out

    uniq = gen_files(h, w, args.unique)
    paths = [uniq[i % len(uniq)] for i in range(args.n)]
    n_mixed = 0
    if args.mixed_dims and args.mixed_n:
        h2, w2 = (int(t) for t in args.mixed_dims.split("x"))
        uniq2 = gen_files(h2, w2, min(args.mixed_n, max(args.unique // 2, 1)))
        mixed = [uniq2[i % len(uniq2)] for i in range(args.mixed_n)]
        # Interleave so chunks of both buckets alternate through the queues.
        step = max(len(paths) // (len(mixed) + 1), 1)
        for k, p in enumerate(mixed):
            paths.insert(min((k + 1) * step + k, len(paths)), p)
        n_mixed = len(mixed)
    config = CONFIGS[args.op]
    mpix = (args.n * h * w + (n_mixed * h2 * w2 if n_mixed else 0)) / 1e6

    report = {
        "n_images": len(paths),
        "n_mixed_shape": n_mixed,
        "unique_files": args.unique,
        "dims": [h, w],
        "mixed_dims": args.mixed_dims,
        "op": args.op,
        "max_batch": args.max_batch,
        "tunnel": _tunnel_bandwidth(),
    }

    # Component rates (what a host-attached deployment is bounded by).
    # First-touch anon pages on this VM fault at ~20 MB/s (measured; lazily
    # backed VM memory) while recycled arena pages run at DRAM speed, so
    # components are measured on the SECOND call — the serving loop reuses
    # freed arena pages after its first chunk, making that the steady state.
    # Component probe uses primary-shape files only (decode_batch is
    # same-shape by contract; mixed shapes are bucketed in the real run).
    chunk = (uniq * (args.max_batch // len(uniq) + 1))[: args.max_batch]
    for p in chunk:  # warm the page cache so both probes read warm files
        open(p, "rb").read()
    # What _read_and_decode actually runs (round 4): the FILE-native batch
    # decoder — payloads pread() straight into the tensor, one copy.
    t_dec = []
    batch = None
    for _ in range(3):
        del batch  # free BEFORE the next alloc so the arena is reused
        batch = None
        t0 = time.perf_counter()
        batch, errs = native.decode_batch_files(chunk, h, w)
        assert not errs
        t_dec.append(time.perf_counter() - t0)
    report["host_decode_mpix_s"] = round(
        len(chunk) * h * w / min(t_dec) / 1e6, 1)
    # The round-3 path (Python read loop -> bytes -> decode_batch memcpy),
    # kept for comparison. Note r03's probe timed decode_batch ALONE — the
    # Python file reads it needs were outside the timed region, so its
    # 1078.9 overstated the deployable component rate; this row times the
    # whole byte path honestly.
    t_dec_py = []
    for _ in range(3):
        del batch
        batch = None
        t0 = time.perf_counter()
        buffers = [open(p, "rb").read() for p in chunk]
        batch, _ = native.decode_batch(buffers)
        t_dec_py.append(time.perf_counter() - t0)
    report["host_decode_bytes_mpix_s"] = round(
        len(chunk) * h * w / min(t_dec_py) / 1e6, 1)
    gray = batch.astype(np.uint16).sum(axis=3) // 3
    gray = gray.astype(np.uint8)
    enc_paths = [
        os.path.join(args.workdir, f"enc_probe_{j}.out")
        for j in range(len(chunk))
    ]
    # What _encode_chunk actually runs: the threaded native batch encoder.
    t_enc = []
    for _ in range(2):
        t0 = time.perf_counter()
        native.encode_batch_files(
            enc_paths, gray, ppm.FILETYPE_PGM, [255] * len(chunk))
        t_enc.append(time.perf_counter() - t0)
    report["host_encode_mpix_s"] = round(
        len(chunk) * h * w / min(t_enc) / 1e6, 1)
    # The round-3 probe (serial write_ppm loop), kept for comparison.
    t_enc_py = []
    for _ in range(2):
        t0 = time.perf_counter()
        for j in range(len(chunk)):
            ppm.write_ppm(enc_paths[j], gray[j], file_type=ppm.FILETYPE_PGM)
        t_enc_py.append(time.perf_counter() - t0)
    report["host_encode_py_mpix_s"] = round(
        len(chunk) * h * w / min(t_enc_py) / 1e6, 1)
    for p in enc_paths:
        os.unlink(p)
    del buffers, batch, gray

    # Resident-device pipeline rate (loop harness, transfers excluded).
    import jax

    from imageprocessingtools_tpu.kernels.fused import fused_pipeline_xla
    from imageprocessingtools_tpu.utils.timing import device_loop_rate

    img4 = np.random.default_rng(1).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    sec = device_loop_rate(fused_pipeline_xla, img4, iters=20, repeats=5,
                           stat="median")
    report["device_pipeline_mpix_s"] = round(h * w / sec / 1e6, 1)
    report["production_bound_mpix_s"] = min(
        report["host_decode_mpix_s"],
        report["host_encode_mpix_s"],
        report["device_pipeline_mpix_s"],
    )

    if args.components_only:
        print(json.dumps(report, indent=2))
        return

    # Warm the jit cache so the measured run is steady-state serving.
    serving.process_files(paths[: args.max_batch], config,
                          max_batch=args.max_batch, suffix=".warm")

    import resource

    rss_before_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    outs = serving.process_files(paths, config, max_batch=args.max_batch)
    wall = time.perf_counter() - t0
    assert len(outs) == len(paths)
    rss_peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    chunk_bytes = args.max_batch * h * w * 3

    report.update({
        "end_to_end_wall_s": round(wall, 2),
        "end_to_end_mpix_s": round(mpix / wall, 1),
        "images_per_s": round(len(paths) / wall, 2),
        "peak_rss_mb": round(rss_peak_kb / 1024, 1),
        "rss_before_run_mb": round(rss_before_kb / 1024, 1),
        "chunk_payload_mb": round(chunk_bytes / 1e6, 1),
        "rss_note": ("peak RSS must stay ~O(5 chunks) + runtime baseline "
                     "regardless of file count (bounded queues; the header "
                     "pass reads 64 KB prefixes only)"),
        "c_reference_mpix_s": 1.6,  # BASELINE.md -gray 4K end-to-end
        "vs_c_reference_end_to_end": round(mpix / wall / 1.6, 1),
        "note": ("end-to-end is bounded by the ~10 MB/s TPU tunnel of this "
                 "environment, not by the framework; see component rates"),
    })

    if args.ab:
        n_ab = min(args.n, max(args.n // 4, 2 * args.max_batch))
        t0 = time.perf_counter()
        serving.process_files(paths[:n_ab], config,
                              max_batch=args.max_batch, suffix=".seq",
                              overlap=False)
        seq = time.perf_counter() - t0
        t0 = time.perf_counter()
        serving.process_files(paths[:n_ab], config,
                              max_batch=args.max_batch, suffix=".ovl")
        ovl = time.perf_counter() - t0
        report["ab_n_images"] = n_ab
        report["ab_sequential_wall_s"] = round(seq, 2)
        report["ab_overlap_wall_s"] = round(ovl, 2)
        report["ab_overlap_speedup"] = round(seq / ovl, 2)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
