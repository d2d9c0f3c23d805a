"""PNG decode throughput: scalar vs vectorised unfilter (VERDICT r12
item 4). Decodes a 500-image staged batch per variant and records
MB/s of RAW (post-decode) pixel bytes per core, plus the per-filter
row mix, so the 'per-byte Python' caveat in the multimodal docs
becomes a measured number.

Usage: python tools/measure_png_throughput.py [json_out]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from gmall_realtime_flink_spark.operators import multimodal as mm  # noqa: E402

N_IMAGES = 500


def staged_batch() -> list[bytes]:
    """Deterministic 500-image batch: sizes/types swept like the
    registry payloads but larger (64x64 .. 160x96) so the unfilter
    dominates the profile rather than chunk-walk overhead."""
    out = []
    for i in range(N_IMAGES):
        w = 64 + (i % 7) * 16
        h = 64 + (i % 3) * 16
        ctype = (0, 2, 6)[i % 3]
        ch = {0: 1, 2: 3, 6: 4}[ctype]
        px = bytes(((x * 7 + y * 13 + i) % 256)
                   for y in range(h) for x in range(w * ch))
        out.append(mm.encode_png(w, h, px, color_type=ctype))
    return out


def run(payloads: list[bytes]) -> tuple[float, int]:
    t0 = time.time()
    raw = 0
    for p in payloads:
        d = mm._decode_png(p)
        raw += len(d["values"])
    return time.time() - t0, raw


def main() -> int:
    json_out = sys.argv[1] if len(sys.argv) > 1 else "PNG_THROUGHPUT.json"
    payloads = staged_batch()

    # vectorised (current) path
    sec_vec, raw = run(payloads)
    # scalar path: route every row through the reference loop
    orig = mm._png_unfilter_row
    mm._png_unfilter_row = mm._png_unfilter_row_scalar
    try:
        sec_scalar, raw2 = run(payloads)
    finally:
        mm._png_unfilter_row = orig
    assert raw == raw2

    out = {
        "n_images": N_IMAGES,
        "raw_mb": round(raw / 1e6, 1),
        "scalar": {"sec": round(sec_scalar, 2),
                   "mb_per_s_per_core": round(raw / 1e6 / sec_scalar, 2)},
        "vectorized": {"sec": round(sec_vec, 2),
                       "mb_per_s_per_core": round(raw / 1e6 / sec_vec, 2)},
        "speedup": round(sec_scalar / sec_vec, 2),
        "note": "encoder cycles filters 0-4 per row; None/Up/Sub rows "
        "are vectorised (copy / element-wise add / per-lane uint8 "
        "cumsum); Average/Paeth keep the spec's irreducible "
        "left-neighbour scan but in specialised tight loops (no "
        "per-byte filter branch, inlined abs-free Paeth predictor) — "
        "still the acknowledged native-codec swap point at "
        "production image volume",
    }
    with open(json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
