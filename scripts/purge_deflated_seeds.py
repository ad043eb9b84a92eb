#!/usr/bin/env python3
"""One-time migration (round 12 #1): purge noise-deflated trusted seeds.

The bench gate's first seeding (commit 4a26547) took the pre-`trusted`
d823ed5 detail file's `corrected` figures verbatim. For every query whose
winning run in that min-of-1 judge run was contended (noise >= 1.3),
corrected = raw / noise is a deflation ESTIMATE, not a measurement — and
each such entry mints exactly one phantom REGRESSION flag at the query's
first quiet measurement (both r11 flags, dedup_prefix_jaccard and
q7_volume_shipping, were this).

Rule (VERDICT r11): a current `trusted` entry equal to its d823ed5-era
seedFallback value whose recorded noise was >= 1.3 is a deflation
estimate -> DELETE it; the query re-earns a baseline at its first quiet
measurement.  Entries whose d823ed5 figure was itself quiet (corrected ==
raw inside the dead-band) are honest measurements and stay, as does
anything updated by a quiet run since.

Usage: python3 scripts/purge_deflated_seeds.py   (from the repo root)
Idempotent: re-running after the purge deletes nothing further.
"""
import json
import subprocess
import sys

QUIET_FACTOR = 1.3
SEED_COMMIT = "d823ed5"  # round-10 close: the pre-`trusted` detail file


def num2(x):
    return "%.2f" % x


def old_seed(raw, corrected, noise):
    """The ORIGINAL (pre-r12) seedFallback the first seeding ran with."""
    if corrected >= 0:
        return corrected
    if raw < 0:
        return None
    return raw if noise < QUIET_FACTOR else raw / max(1.0, noise)


def main():
    old = json.loads(
        subprocess.run(
            ["git", "show", f"{SEED_COMMIT}:BENCH_DETAIL.json"],
            capture_output=True, text=True, check=True,
        ).stdout
    )
    cur = json.load(open("BENCH_DETAIL.json"))
    oq, oc, on = old["queries"], old.get("corrected", {}), old.get("noise", {})
    trusted = cur["trusted"]

    purged, kept = [], {}
    for k, v in trusted.items():
        seed = old_seed(oq.get(k, -1.0), oc.get(k, -1.0), on.get(k, 1.0))
        contended = on.get(k, 1.0) >= QUIET_FACTOR
        if seed is not None and contended and num2(v) == num2(seed):
            purged.append(k)
        else:
            kept[k] = v

    cur["trusted"] = kept
    # drop the (phantom, r11-adjudicated) regressions record along with
    # the seeds that minted it
    cur.pop("regressions", None)
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(cur, f, separators=(",", ":"))
    print(f"purged {len(purged)} deflated seeds, kept {len(kept)} "
          f"quiet-confirmed baselines", file=sys.stderr)


if __name__ == "__main__":
    main()
