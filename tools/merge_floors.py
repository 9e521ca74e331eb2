#!/usr/bin/env python3
"""Min-merge a fresh full-suite bench record into a committed floor file.

Floor semantics (bench_reference*.json): per-row MIN over all committed
quiet runs. This tool only ever LOWERS a row or ADDS a new one (q156
etc.); it never raises a floor. Rows the fresh run beat are listed so
the note can carry provenance.

Usage: python3 tools/merge_floors.py <floor.json> <fresh_record.json>
         [note-suffix]
"""
import json
import sys


def main():
    floor_path, fresh_path = sys.argv[1], sys.argv[2]
    suffix = sys.argv[3] if len(sys.argv) > 3 else None
    floor = json.load(open(floor_path))
    fresh = json.load(open(fresh_path))
    fq, nq = floor["queries"], dict(fresh["queries"])
    # quiet-tail retimes are quiet measurements: min them in
    import re
    for name, rec in fresh.get("retimed", {}).items():
        m = re.match(r"retimed=([\d.]+)s calib=[\d.]+s\(quiet\)", rec)
        if m:
            nq[name] = min(nq.get(name, 1e18), float(m.group(1)))
    lowered, added = [], []
    for name, t in nq.items():
        if name not in fq:
            fq[name] = t
            added.append((name, t))
        elif t < fq[name]:
            lowered.append((name, fq[name], t))
            fq[name] = t
    floor["value"] = round(sum(fq.values()), 3)
    if suffix:
        floor["note"] = floor.get("note", "") + " " + suffix
    json.dump(floor, open(floor_path, "w"), indent=1)
    print(f"{floor_path}: lowered {len(lowered)}, added {len(added)}, "
          f"new floor total {floor['value']}")
    for name, old, new in sorted(lowered, key=lambda x: x[1] - x[2])[:15]:
        print(f"  lowered {name}: {old:.3f} -> {new:.3f}")
    for name, t in added:
        print(f"  added {name}: {t:.3f}")


if __name__ == "__main__":
    main()
