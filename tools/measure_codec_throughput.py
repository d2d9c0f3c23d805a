"""Decode throughput for the audio/container codec tier (r13).

Stages payloads for N documents and times the full decode entry
(attach + decode kernels, noop write) on local[CPUS], reporting
docs/s and payload MB/s overall and per core — the measured basis
for SCALE.md's "narrow mapInPandas, scales with splits" claims on
the r13 codecs (MP3 walk, IMA ADPCM, FLAC), next to round-12's
PNG_UNFILTER numbers.

Usage: python tools/measure_codec_throughput.py [sf_dir] [json_out]
(defaults: .local/sf10, CODEC_THROUGHPUT_r13.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmall_realtime_flink_spark.catalog import load  # noqa: E402
from gmall_realtime_flink_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf10"
    json_out = (
        sys.argv[2] if len(sys.argv) > 2 else "CODEC_THROUGHPUT_r13.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="codec-throughput", cpus=cpus)

    from gmall_realtime_flink_spark.operators.multimodal import (
        attach_adpcm_payload,
        attach_flac_payload,
        attach_mp3_payload,
        audio_features,
        audio_features_adpcm_batched,
        mp3_frame_stats,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = d.count()

    cases = {
        "mp3_header_walk": (attach_mp3_payload, mp3_frame_stats),
        "ima_adpcm_decode": (attach_adpcm_payload, audio_features),
        "ima_adpcm_decode_batched": (
            attach_adpcm_payload,
            audio_features_adpcm_batched,
        ),
        "flac_decode": (attach_flac_payload, audio_features),
    }
    out: dict[str, dict] = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "cases": {},
    }
    for name, (attach, kernel) in cases.items():
        staged = attach(d)
        payload_bytes = staged.agg(
            F.sum(F.octet_length("payload")).alias("b")
        ).collect()[0]["b"]
        # stage once to parquet so the timed pass prices DECODE, not
        # payload synthesis
        tmp = os.path.join(".local", f"codec_tp_{name}")
        staged.write.mode("overwrite").parquet(tmp)
        frozen = spark.read.parquet(tmp)
        t0 = time.time()
        kernel(frozen).write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        mb = payload_bytes / 1e6
        out["cases"][name] = {
            "sec": sec,
            "payload_mb": round(mb, 1),
            "docs_per_sec": round(n_docs / sec, 1),
            "mb_per_sec": round(mb / sec, 2),
            "mb_per_sec_per_core": round(mb / sec / cpus, 3),
        }
        print(name, out["cases"][name], flush=True)
    with open(json_out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", json_out)


if __name__ == "__main__":
    main()
