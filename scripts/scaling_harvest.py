#!/usr/bin/env python
"""Quiet-window scaling-pair harvester.

The 8→32-CPU flagship scaling ratio on this box is gated by AMBIENT
memory-bandwidth co-tenancy (BASELINE.md "scaling" section): identical
32-CPU runs swing ~2× between windows while 8-CPU holds.  Rather than
burning a fixed block of runs into whatever window happens to be live,
this harvester polls the contention signals (bench.mem_bw_canary +
/proc co-tenant cores) and only fires an interleaved (8-CPU, 32-CPU)
pair when the window is quiet.  Pairs append to OUT as JSON lines; each
run carries its own canary/co-tenant accounting so a window that turns
loud mid-pair is filtered post-hoc.

Usage: python scripts/scaling_harvest.py [max_pairs] [max_hours]
Writes /tmp/scaling_measuring.flag while a pair is in flight (so an
operator can avoid launching competing work).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

PIPELINE = os.environ.get("GRAFT_BENCH_PIPELINE", "flagship")
# image rows are ~300× heavier per row than flagship rows — default the
# corpus so an 8-CPU leg stays ~1-2 min for either pipeline
_DEF_EXPAND = {"flagship": bench.SCALE_EXPAND, "image": 800}
EXPAND = int(os.environ.get("GRAFT_SCALE_EXPAND", _DEF_EXPAND[PIPELINE]))
OUT = ("/tmp/scaling_pairs_r4.jsonl" if PIPELINE == "flagship"
       else f"/tmp/scaling_pairs_r4_{PIPELINE}.jsonl")
FLAG = "/tmp/scaling_measuring.flag"
MAX_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
MAX_HOURS = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
QUIET_CANARY_S = 0.5
QUIET_COTENANT_CORES = 1.5
PROBE_S = 4.0


def probe_quiet() -> tuple[bool, float, float]:
    b0, o0 = bench.host_busy_cpu_s(), bench.own_busy_cpu_s()
    c = bench.mem_bw_canary()
    dt = max(PROBE_S - 0.0, 0.5)
    time.sleep(PROBE_S)
    cot = ((bench.host_busy_cpu_s() - b0) - (bench.own_busy_cpu_s() - o0)) / dt
    return (c < QUIET_CANARY_S and cot < QUIET_COTENANT_CORES), c, cot


def one(cpus: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
               GRAFT_SF_DIR=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"),
               GRAFT_BENCH_EXPAND=str(EXPAND),
               GRAFT_BENCH_PIPELINE=PIPELINE)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__), "bench.py"),
         "--single"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(bench.__file__)))
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    deadline = time.time() + MAX_HOURS * 3600
    pairs = 0
    bench.mem_bw_canary()   # first-touch warmup
    while pairs < MAX_PAIRS and time.time() < deadline:
        quiet, c, cot = probe_quiet()
        if not quiet:
            print(f"loud (canary={c:.2f}s cotenant={cot:.1f} cores); waiting",
                  flush=True)
            time.sleep(45)
            continue
        open(FLAG, "w").write(str(time.time()))
        try:
            r8 = one(8)
            r32 = one(32)
        finally:
            try:
                os.remove(FLAG)
            except OSError:
                pass
        eff = (r32["rows_per_s"] / r8["rows_per_s"]) / 4.0
        rec = {"ts": time.time(), "eff_8_32": round(eff, 3),
               "probe_canary_s": c, "probe_cotenant_cores": round(cot, 2),
               "r8": r8, "r32": r32}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        pairs += 1
        print(f"pair {pairs}: eff={eff:.3f} "
              f"(8cpu {r8['rows_per_s']:.0f} r/s canary {r8['mem_bw_canary_s']:.2f}; "
              f"32cpu {r32['rows_per_s']:.0f} r/s canary {r32['mem_bw_canary_s']:.2f})",
              flush=True)
        time.sleep(30)   # settle: let reclaim finish before re-probing
    print(f"done: {pairs} pairs -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
