"""Driver-head rotation audit (VERDICT r8 item 8).

Emits DRIVER_COVERAGE_r{N}.json: for every registry entry, which
driver CORRECTNESS_r*.json artifacts (the per-round independent
hash checks over the first-50 head) it has appeared in, plus the
never-checked backlog the next head rotation should burn down. The
builder's own tiers (tests/test_oracle.py, adversarial/empty gates,
SF ladder) already cover all entries every round — this audit tracks
only the DRIVER's independent-process checks.

Usage: python tools/audit_driver_coverage.py [json_out]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_realtime_flink_spark.plans import REGISTRY, _DRIVER_PRIORITY  # noqa: E402


def main() -> int:
    json_out = sys.argv[1] if len(sys.argv) > 1 else "DRIVER_COVERAGE.json"
    seen: dict[str, list[int]] = {}
    arts = sorted(
        glob.glob("artifacts/r*/CORRECTNESS_r*.json")
        + glob.glob("CORRECTNESS_r*.json")
    )
    for p in arts:
        rnd = int(p.split("_r")[-1].split(".")[0])
        for k in json.load(open(p)):
            rounds = seen.setdefault(k, [])
            if rnd not in rounds:
                rounds.append(rnd)
    # VERDICT r11 item 2 (twice-stale artifact): the DRIVER's
    # CORRECTNESS_r{N} for the CURRENT round is written after the
    # build turns end, so entries brand-new this round can never
    # appear in a driver artifact at generation time. Committed
    # VERIFY_HEAD_r*.json emulation runs (tools/verify_head.py — the
    # same hash compare under a plain driver-like session, separate
    # process) close that gap; they are tracked SEPARATELY so a
    # reader can tell driver evidence from local-emulation evidence.
    local_seen: dict[str, list[int]] = {}
    local_arts = sorted(glob.glob("VERIFY_HEAD_r*.json"))
    for p in local_arts:
        rnd = int(p.split("_r")[-1].split(".")[0])
        doc = json.load(open(p))
        for k, v in doc.get("results", doc).items():
            if isinstance(v, dict) and v.get("ok"):
                rounds = local_seen.setdefault(k, [])
                if rnd not in rounds:
                    rounds.append(rnd)
    never = sorted(
        n for n in REGISTRY if n not in seen and n not in local_seen
    )
    out = {
        "artifacts_scanned": arts,
        "local_emulations_scanned": local_arts,
        "registry_total": len(REGISTRY),
        "driver_checked": sum(1 for n in REGISTRY if n in seen),
        # VERDICT r12 what's-wrong item 1: entries already rotated
        # into the current head will be driver-checked when THIS
        # round's CORRECTNESS artifact lands — report them as pending
        # rather than emulation-only so the committed artifact doesn't
        # under-claim when the audit runs before the driver does.
        "pending_this_round_head": sorted(
            n for n in REGISTRY
            if n in local_seen and n not in seen and n in _DRIVER_PRIORITY
        ),
        "local_emulation_only": sorted(
            n for n in REGISTRY
            if n in local_seen and n not in seen
            and n not in _DRIVER_PRIORITY
        ),
        "never_checked": never,
        "head_covers_backlog": sorted(
            set(never) - set(_DRIVER_PRIORITY)
        ),  # empty = current head closes the backlog
        "last_checked_round": {
            n: max(seen[n]) for n in sorted(REGISTRY) if n in seen
        },
    }
    with open(json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"{out['driver_checked']}/{out['registry_total']} driver-checked; "
        f"never: {len(never)}; not in current head: "
        f"{out['head_covers_backlog']}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
