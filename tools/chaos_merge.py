#!/usr/bin/env python3
"""Merge per-seed ChaosDuel artifacts into one soak manifest
(CHAOS_r15.json) and ASSERT the per-seed accounting (r14 VERDICT
item 6): violations empty at every seed, one winner per round,
fencing generations monotone with the final generation reflecting
every committed steal.

Usage: tools/chaos_merge.py OUT SEED_JSON [SEED_JSON ...]
Exits non-zero if any seed violates.
"""
import json
import sys


def main():
    out_path = sys.argv[1]
    seeds = []
    bad = 0
    for p in sys.argv[2:]:
        with open(p) as f:
            r = json.load(f)
        checks = {
            "violations_empty": r["violations"] == [],
            "one_winner_per_round": len(r["winners"]) == r["rounds"],
            "generations_monotone": all(
                a <= b for a, b in zip(r["fence_generations"],
                                       r["fence_generations"][1:])),
            # every committed steal bumped the epoch at least once past
            # the clean-handoff chain; final gen >= 1 + steals is the
            # conservative floor (kills/handoffs may add more)
            "final_gen_covers_steals": (
                (r["fence_generations"][-1] if r["fence_generations"] else 0)
                >= 1 + r["steals_committed"]),
        }
        if not all(checks.values()):
            bad += 1
        seeds.append({
            "seed": r["seed"], "writers": r["writers"],
            "rounds": r["rounds"], "kills": r["kills"],
            "freezes": r["freezes"],
            "steals_committed": r["steals_committed"],
            "final_generation": (r["fence_generations"][-1]
                                 if r["fence_generations"] else 0),
            "generation_chain_len": len(r["fence_generations"]),
            "violations": r["violations"],
            "checks": checks,
        })
        print(f"[chaos] seed={r['seed']} kills={r['kills']} "
              f"freezes={r['freezes']} steals={r['steals_committed']} "
              f"final_gen={seeds[-1]['final_generation']} "
              f"ok={all(checks.values())}")
    out = {
        "metric": "chaos_fence_soak",
        "design": ("randomized adversary schedule per seed: "
                   "seeded-random SIGKILL rounds + SIGSTOP-freeze "
                   "targets with payload-stealer commits; global "
                   "invariants checked from the final table state"),
        "seeds": seeds,
        "all_seeds_clean": bad == 0,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"[chaos] wrote {out_path} all_clean={bad == 0}")
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
