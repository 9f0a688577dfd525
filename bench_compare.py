"""Canary-normalized bench comparison (r15 verdict #6 operationalized).

Usage: ``python bench_compare.py OLD NEW`` where each argument is either

- a raw ``bench.py`` output file / one-JSON-line file, or
- a driver ``BENCH_r{N}.json`` wrapper (``{"n":…, "rc":…, "tail": "…"}``
  whose ``tail`` holds the last bytes of bench stdout — often cut
  mid-JSON, so per-slot figures are extracted from whatever slots are
  visible in the tail rather than by full parsing).

Prints: raw warm totals, each run's machine-calibration canary, the
canary ratio (all-core throughput — the figure r15's cross-machine
analysis showed tracks slot drift), the common-slot median ratio, the
canary-normalized median, and the slots above a 1.5× bar (ignoring
sub-0.1 s slots, where timer noise dominates).

Cross-round comparisons should quote the CANARY-NORMALIZED median: the
r14→r15 driver regression (122 s → 198 s raw) was entirely machine —
normalized median ≈ 1.0 — and this tool exists so that distinction is a
recorded number instead of a per-round argument.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def _extract(path: str) -> tuple[dict[str, float], dict | None, float | None]:
    """(warm slot timings, canary dict | None, warm total | None)."""
    text = open(path, encoding="utf-8").read()
    # driver wrapper? its 'tail' holds (possibly truncated) bench stdout
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "tail" in obj and "queries" not in obj:
        text = obj["tail"]
        obj = None
    if obj is None:
        # try the last full JSON line first
        for line in reversed(text.strip().splitlines()):
            try:
                obj = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if isinstance(obj, dict) and "queries" in obj:
        canary = obj.get("machine_calibration")
        return dict(obj["queries"]), canary, obj.get("value")
    # truncated tail: scrape visible "name": number pairs that appear
    # inside the warm 'queries' object region if present, else all
    # top-level-looking pairs (slot names never collide with scalar
    # field names, which we filter out)
    slots: dict[str, float] = {}
    scalar_fields = {
        "value", "sf", "cold_total_sec", "single_thread_sec",
        "spark_allcore_sec", "checksum", "invalidation_events",
        "wall_sec", "events_per_sec", "warm_wall_sec",
        "warm_events_per_sec", "first_read_sec", "warm_read_sec",
        "warm_med", "cold", "n", "rc", "cpus",
    }
    # cut at the cold-queries object if present so cold timings are
    # not mistaken for warm ones (warm dict precedes "cold_total_sec")
    warm_region = text.split('"cold_total_sec"')[0]
    for m in re.finditer(r'"([a-z0-9_]+)":\s*(-?\d+\.?\d*)', warm_region):
        name, val = m.group(1), float(m.group(2))
        if name not in scalar_fields:
            slots[name] = val
    canary = None
    cm = re.search(
        r'"machine_calibration":\s*({[^}]*})', text
    )
    if cm:
        try:
            canary = json.loads(cm.group(1))
        except json.JSONDecodeError:
            pass
    vm = re.search(r'"value":\s*(-?\d+\.?\d*)', text)
    return slots, canary, float(vm.group(1)) if vm else None


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old_slots, old_canary, old_total = _extract(sys.argv[1])
    new_slots, new_canary, new_total = _extract(sys.argv[2])
    print(f"raw warm totals: {old_total} -> {new_total}")
    canary_ratio = None
    if old_canary and new_canary:
        if old_canary.get("checksum") != new_canary.get("checksum"):
            print("WARNING: canary checksums differ — canary changed, "
                  "normalization is not meaningful")
        for k in ("single_thread_sec", "spark_allcore_sec"):
            o, n = old_canary.get(k), new_canary.get(k)
            if o and n:
                print(f"canary {k}: {o} -> {n} (x{n / o:.3f})")
        o, n = (old_canary.get("spark_allcore_sec"),
                new_canary.get("spark_allcore_sec"))
        if o and n:
            canary_ratio = n / o
    common = sorted(
        k for k in old_slots.keys() & new_slots.keys()
        if old_slots[k] >= 0.1  # timer noise floor
    )
    if not common:
        sys.exit("no common slots >= 0.1 s found")
    ratios = {k: new_slots[k] / old_slots[k] for k in common}
    med = statistics.median(ratios.values())
    print(f"common slots >=0.1s: {len(common)}; median ratio x{med:.3f}")
    if canary_ratio:
        print(f"canary-normalized median: x{med / canary_ratio:.3f} "
              f"(canary all-core x{canary_ratio:.3f})")
    bar = 1.5
    over = {k: r for k, r in ratios.items() if r > bar}
    for k in sorted(over, key=over.get, reverse=True):
        print(f"  over {bar}x: {k}: {old_slots[k]} -> {new_slots[k]} "
              f"(x{over[k]:.2f})")
    if not over:
        print(f"  no slots over {bar}x")


if __name__ == "__main__":
    main()
