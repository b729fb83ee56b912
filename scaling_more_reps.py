#!/usr/bin/env python
"""Extra calm-window paired reps for the sf0.8 scaling record, reusing the
already-generated corpus at /tmp/horus_scaling_sf0.8 (scaling_bench.py child
mode does the actual work; this wrapper only orchestrates and reports)."""
import json, shutil, subprocess, sys, os
work = "/tmp/horus_scaling_sf0.8"
corpus = f"{work}/corpus.parquet"
lo, hi = 2, 8
reps = int(os.environ.get("SCALING_REPS", "2"))
effs = []
for r in range(reps):
    rec = {}
    for cores in (lo, hi):
        shutil.rmtree(f"{work}/ix_{cores}", ignore_errors=True)
        cmd = ["taskset", "-c", f"0-{cores-1}", sys.executable,
               "/root/repo/scaling_bench.py", "--run", str(cores), corpus, f"{work}/ix_{cores}"]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        if out.returncode != 0:
            print(out.stderr[-4000:], flush=True)
            raise RuntimeError(f"child run failed (cores={cores}, rc={out.returncode})")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rec[cores] = json.loads(line)
        print(f"rep{r} {line}", flush=True)
    pe = (rec[lo]["build_s"] / rec[hi]["build_s"]) / (hi / lo)
    st = {s: round((rec[lo]["stage_walls"][s] / rec[hi]["stage_walls"][s]) / (hi/lo), 3)
          for s in rec[lo]["stage_walls"] if rec[lo]["stage_walls"].get(s) and rec[hi]["stage_walls"].get(s)}
    effs.append(round(pe, 3))
    print(f"rep{r} paired_efficiency {pe:.3f} stages {st}", flush=True)
print(json.dumps({"paired_efficiencies": effs}), flush=True)
