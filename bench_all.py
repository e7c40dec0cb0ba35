"""Run every benchmark and print a summary table + one JSON line per bench.

Each bench script keeps its one-line-JSON contract (the driver consumes
`bench.py` alone); this runner is the human-facing sweep:

    python bench_all.py            # inference/GGS/matching benches
    python bench_all.py full       # also the train bench (first compile of
                                   # the 512-image train step takes ~25 min)

Results land in benchmarks.json next to this file.
"""

import json
import subprocess
import sys

# (argv, label, extra-env) — extra-env is merged into the subprocess env
BENCHES = [
    (["bench.py"], "20-frame inference, no GGS", {}),
    (["bench.py", "--ddim", "10"], "20-frame inference, DDIM-10, no GGS", {}),
    (["bench.py", "--image-size", "336"], "20-frame inference @336px (Re10K)", {}),
    (["bench_ggs.py"], "20-frame inference, with GGS", {}),
    (["bench_matching.py"], "20-frame match extraction", {}),
    (["bench_train.py"], "reference-scale train step (f32)", {}),
    (["bench_train.py"], "reference-scale train step (bf16)",
     {"POSEDIFFUSION_BENCH_DTYPE": "bfloat16"}),
]


def main():
    import os

    full = len(sys.argv) > 1 and sys.argv[1] == "full"
    rows = []
    for argv, label, extra_env in BENCHES:
        script = " ".join(
            [f"{k}={v}" for k, v in extra_env.items()] + argv
        )
        if not full and argv[0] == "bench_train.py":
            continue
        print(f"=== {label} ({script})", flush=True)
        proc = subprocess.run(
            [sys.executable, *argv], capture_output=True, text=True,
            env={**os.environ, **extra_env},
        )
        line = None
        for ln in reversed(proc.stdout.splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        if proc.returncode != 0 or line is None:
            print(f"  FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}")
            rows.append({"script": script, "label": label, "error": True})
            continue
        rec = json.loads(line)
        rec.update(script=script, label=label)
        # provenance: what produced this number, where, when (VERDICT r3:
        # perf artifacts must not outlive the code they measured)
        import datetime
        import subprocess as sp

        rev = sp.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        rec["provenance"] = {
            "git_rev": rev or "unknown",
            "date": datetime.date.today().isoformat(),
            "device": "TPU v5e (1 chip, axon relay)",
        }
        rows.append(rec)
        print(f"  {rec['metric']}: {rec['value']:.6g} {rec['unit']} "
              f"(vs_baseline {rec['vs_baseline']:.4g})", flush=True)

    with open("benchmarks.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("\nwrote benchmarks.json")
    for r in rows:
        if not r.get("error"):
            speedup = 1.0 / r["vs_baseline"] if r["vs_baseline"] else float("inf")
            print(f"{r['label']:<38} {r['value']:>12.6g} {r['unit']:<6} "
                  f"{speedup:>8.1f}x vs reference")


if __name__ == "__main__":
    main()
