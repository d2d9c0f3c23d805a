"""Stamp README gate counts from the artifacts they cite (VERDICT r9
wrong-item 1: the r9 evidence row said 170/170 while the final
artifacts were 175/175 — hand-written counts drift when entries land
after the row is written).

Rewrites, in README.md:
  - the standing-gates sentence: latest ADVERSARIAL_r{N}.json /
    ADVERSARIAL_EMPTY_r{N}.json names and their checked-counts, read
    from the JSONs themselves;
then scans the whole README for any remaining `K/K each` gate-count
mention that disagrees with the latest artifacts and fails loudly
(exit 1) so a stale hand-written row can't survive round close.

Usage: python tools/stamp_readme.py   (run at round close, idempotent)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest(pattern: str) -> str:
    paths = glob.glob(os.path.join(ROOT, pattern))
    assert paths, f"no artifact matching {pattern}"

    def rnum(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=rnum)


def main() -> int:
    adv = latest("ADVERSARIAL_r*.json")
    emp = latest("ADVERSARIAL_EMPTY_r*.json")
    d_adv, d_emp = json.load(open(adv)), json.load(open(emp))
    n_adv, n_emp = len(d_adv["results"]), len(d_emp["results"])
    # the gate rewrites its artifact incrementally — refuse partials
    for d, p in ((d_adv, adv), (d_emp, emp)):
        assert len(d["results"]) == d["total"], (
            f"{p} is a mid-run partial ({len(d['results'])}/{d['total']})"
            " — wait for the gate to finish"
        )
    assert not d_adv["bad"] and not d_emp["bad"], (
        f"refusing to stamp failing gates: {d_adv['bad']} {d_emp['bad']}"
    )
    counts = (
        f"{n_adv}/{n_adv}" if n_adv == n_emp
        else f"{n_adv}+{n_emp}"
    )
    a, e = os.path.basename(adv), os.path.basename(emp)

    rd = os.path.join(ROOT, "README.md")
    src = open(rd).read()
    new, n_sub = re.subn(
        r"\(`ADVERSARIAL_r\d+\.json`, `ADVERSARIAL_EMPTY_r\d+\.json`,"
        r" [\d/+ ]+ each;",
        f"(`{a}`, `{e}`, {counts} each;",
        src,
    )
    assert n_sub == 1, f"standing-gates sentence not found ({n_sub} hits)"
    if new != src:
        open(rd, "w").write(new)
        print(f"stamped: {a} + {e} -> {counts} each")
    else:
        print(f"already current: {counts} each")

    # drift scan: any other N/N-each mention tied to the LATEST round's
    # artifacts must carry the artifact count (older rounds' rows keep
    # their historical numbers — they cite their own artifacts)
    rtag = re.search(r"_r(\d+)\.json$", a).group(1)
    stale = [
        m.group(0)
        for m in re.finditer(
            rf"ADVERSARIAL\w*_r{rtag}\.json[^|\n]*?(\d+)/(\d+)", new
        )
        # `or`: a HALF-stale row ("175/177 each") is still drift — the
        # scan exists to loud-fail any count that no longer matches
        if m.group(1) != str(n_adv) or m.group(2) != str(n_adv)
    ]
    if stale:
        print(f"STALE gate counts near r{rtag} artifact mentions: {stale}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
