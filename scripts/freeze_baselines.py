#!/usr/bin/env python3
"""Freeze / append per-query baselines (VERDICT r10 ask #1).

BASELINE_queries.json is APPEND-ONLY from round 11 on: each query keeps
the {sec, protocol, round} from the round it was FIRST recorded, so the
"within 2x of baseline" bar cannot ratchet by re-recording every round.

Modes:
  freeze  — one-time historical reconstruction (round 11): first
            occurrence per query in BASELINE.md's prose tables (rounds
            2-9), then BENCH_health_r09.json, then BENCH_health_r10.json.
            Refuses to run if the file already has mixed-round provenance
            (i.e. the freeze already happened).
  append  — round-close mode: add rows ONLY for queries absent from
            BASELINE_queries.json, sourced from bench_health.json (or a
            given health file) with the given round number. Existing rows
            are never modified.
  check   — round-close gate (VERDICT r11 ask #3): exit nonzero when the
            health file contains queries with NO frozen baseline — an
            unfrozen query is unguarded by the 2x flag, which is how
            q266-q271 shipped a round without drift protection. Run it
            after `append`; a failure means the append was skipped.
  refreeze — EXPLICIT provenance-carrying re-freeze (r14 verdict: q97's
            frozen row describes a retired pre-orientation plan; q302's
            the retired 15-arm union plan — every noisy run re-litigates
            them). Never silent: the old row moves into the query's
            "superseded" history with the stated reason, and the new sec
            must come from a quiet min-of-3 measurement. This is the q19
            retirement precedent applied to baselines: history kept,
            bar re-stated against the plan that actually ships.

Usage:
  python3 scripts/freeze_baselines.py freeze
  python3 scripts/freeze_baselines.py append <round> [health_file]
  python3 scripts/freeze_baselines.py check [health_file]
  python3 scripts/freeze_baselines.py refreeze <round> <query> <sec> <reason...>
"""
import json, re, sys, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BQ = os.path.join(ROOT, "BASELINE_queries.json")


def parse_baseline_md():
    """First-occurrence {query: (sec, round)} from BASELINE.md 2-col tables."""
    first = {}
    rnd = 2  # the opening engine-baseline table predates round-N headers
    for line in open(os.path.join(ROOT, "BASELINE.md")):
        m = re.match(r"^#+ .*[Rr]ound[- ]?(\d+)", line)
        if m:
            rnd = int(m.group(1))
        cells = [c.strip() for c in line.split("|")]
        # 2-col rows: | qNN_name | sec |  (decade-probe 5-col rows excluded)
        if len(cells) == 4 and re.match(r"^q\d+_", cells[1]):
            try:
                sec = float(cells[2])
            except ValueError:
                continue
            if cells[1] not in first:
                first[cells[1]] = (sec, rnd)
    return first


def health_secs(path):
    d = json.load(open(path))
    return {q: h["sec"] for q, h in d.get("health", {}).items()}


def freeze():
    cur = json.load(open(BQ))
    rounds = {r.get("round") for r in cur.values()}
    if len(rounds) > 1:
        sys.exit("freeze already applied (mixed round provenance) — refusing")
    out = {}
    md = parse_baseline_md()
    for q, (sec, rnd) in md.items():
        out[q] = {"sec": sec, "protocol": "first_recorded_sf0.1", "round": rnd}
    for path, rnd in [("BENCH_health_r09.json", 9), ("BENCH_health_r10.json", 10)]:
        p = os.path.join(ROOT, path)
        if os.path.exists(p):
            for q, sec in health_secs(p).items():
                if q not in out:
                    out[q] = {"sec": sec,
                              "protocol": "driver_suite_sf0.1_min_of_reps",
                              "round": rnd}
    # sanity: nothing currently recorded may vanish
    missing = set(cur) - set(out)
    if missing:
        sys.exit(f"queries lost in freeze: {sorted(missing)}")
    json.dump(dict(sorted(out.items())), open(BQ, "w"), indent=1)
    by_round = {}
    for r in out.values():
        by_round[r["round"]] = by_round.get(r["round"], 0) + 1
    print(f"froze {len(out)} baselines; provenance rounds: {dict(sorted(by_round.items()))}")


def append(rnd, health_file):
    cur = json.load(open(BQ))
    added = 0
    for q, sec in health_secs(health_file).items():
        if q not in cur:
            cur[q] = {"sec": sec,
                      "protocol": "driver_suite_sf0.1_min_of_reps",
                      "round": rnd}
            added += 1
    json.dump(dict(sorted(cur.items())), open(BQ, "w"), indent=1)
    print(f"appended {added} new queries (round {rnd}); {len(cur)} total, existing rows untouched")


def refreeze(rnd, q, sec, reason):
    if sec <= 0:
        sys.exit("refreeze: non-positive sec")
    if not reason.strip():
        sys.exit("refreeze: a reason is mandatory — this is the provenance")
    cur = json.load(open(BQ))
    if q not in cur:
        sys.exit(f"refreeze: {q} has no frozen row (use append)")
    old = dict(cur[q])
    hist = old.pop("superseded", [])
    cur[q] = {"sec": sec, "protocol": "quiet_min_of_3_sf0.1",
              "round": rnd, "refreeze_reason": reason,
              "superseded": hist + [old]}
    json.dump(dict(sorted(cur.items())), open(BQ, "w"), indent=1)
    print(f"refroze {q}: {old['sec']} (r{old['round']}) -> {sec} (r{rnd}); "
          f"reason: {reason}")


def check(health_file):
    cur = json.load(open(BQ))
    missing = sorted(set(health_secs(health_file)) - set(cur))
    if missing:
        sys.exit(f"UNFROZEN queries (no baseline row — the 2x flag cannot "
                 f"fire for them; run `append <round>` first): {missing}")
    print(f"all {len(health_secs(health_file))} benched queries have frozen baselines")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "freeze":
        freeze()
    elif len(sys.argv) >= 3 and sys.argv[1] == "append":
        hf = sys.argv[3] if len(sys.argv) > 3 else os.path.join(ROOT, "bench_health.json")
        append(int(sys.argv[2]), hf)
    elif len(sys.argv) >= 2 and sys.argv[1] == "check":
        hf = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "bench_health.json")
        check(hf)
    elif len(sys.argv) >= 6 and sys.argv[1] == "refreeze":
        refreeze(int(sys.argv[2]), sys.argv[3], float(sys.argv[4]),
                 " ".join(sys.argv[5:]))
    else:
        sys.exit(__doc__)
