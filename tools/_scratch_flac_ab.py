"""A/B equivalence + timing for the FLAC decode optimization (pure
Python, no Spark): decode a staged corpus with the original reader/CRCs
and with the v2 kernels, assert byte-identical outputs, time both."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_realtime_flink_spark.operators import flac as M  # noqa: E402
from tools import _scratch_opt as S  # noqa: E402


def staged_corpus(n_docs: int = 120):
    payloads = []
    for doc_id in range(n_docs):
        p = 32 + (doc_id * 37) % 95
        n = 40 + (doc_id * 13) % 160
        samples = [
            ((p * 911 + i * 2741 + doc_id * 97) % 65536) - 32768
            for i in range(n)
        ]
        payloads.append(M.encode_flac(8000 + doc_id % 3, samples,
                                      type_seed=doc_id % 7))
        if doc_id % 3 == 0:
            left = samples
            right = [((s * 3 + 7) % 65536) - 32768 for s in samples]
            payloads.append(
                M.encode_flac_stereo(8000, left, right,
                                     assign_seed=doc_id % 4)
            )
    return payloads


def run(decoder, payloads):
    t0 = time.perf_counter()
    outs = [decoder(p) for p in payloads]
    return time.perf_counter() - t0, outs


def main() -> None:
    payloads = staged_corpus()
    print(f"{len(payloads)} payloads, {sum(map(len, payloads))} bytes")

    t_old, outs_old = run(M.decode_flac, payloads)

    # monkeypatch the kernels
    orig = (M._BitReader, M.crc8, M.crc16)
    M._BitReader, M.crc8, M.crc16 = (
        S._BitReaderV2, S.crc8_v2, S.crc16_v2,
    )
    try:
        t_new, outs_new = run(M.decode_flac, payloads)
    finally:
        M._BitReader, M.crc8, M.crc16 = orig

    assert outs_old == outs_new, "DECODE OUTPUT DIVERGED"
    print(f"old decode: {t_old:.3f}s   v2 decode: {t_new:.3f}s   "
          f"speedup {t_old / t_new:.2f}x")

    # corrupt-data behavior parity: flip bytes, both must raise alike
    import random

    rng = random.Random(7)
    mismatches = 0
    for _ in range(300):
        p = bytearray(rng.choice(payloads))
        pos = rng.randrange(4, len(p))
        p[pos] ^= 1 << rng.randrange(8)
        b = bytes(p)

        def outcome(fn, payload):
            try:
                return ("ok", fn(payload))
            except Exception as e:  # noqa: BLE001
                return (type(e).__name__, str(e))

        o_old = outcome(M.decode_flac, b)
        M._BitReader, M.crc8, M.crc16 = (
            S._BitReaderV2, S.crc8_v2, S.crc16_v2,
        )
        try:
            o_new = outcome(M.decode_flac, b)
        finally:
            M._BitReader, M.crc8, M.crc16 = orig
        if o_old != o_new:
            mismatches += 1
            print("CORRUPT-PARITY MISMATCH:", o_old, "vs", o_new)
    print(f"corrupt-data parity: {300 - mismatches}/300 identical")
    assert mismatches == 0


if __name__ == "__main__":
    main()
