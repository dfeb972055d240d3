"""Condense a round sweep log (benchmarks/run_round3_sweep.sh output) into a
summary: every bench.py JSON line with the env that produced it, plus
microbench/profiler table headers.  Usage:

    python benchmarks/summarize_sweep.py [/tmp/r3_sweep.log]
"""

import json
import re
import sys


def main(path: str = "/tmp/r3_sweep.log") -> None:
    try:
        lines = open(path).read().splitlines()
    except FileNotFoundError:
        print(f"no sweep log at {path}")
        return

    env = ""
    pending: list = []
    for ln in lines:
        # bash xtrace prints each env prefix of a command on its OWN line
        # (`+ SD_TPU_FUSED_MM=0`) before the `+ timeout ... python ...` line —
        # accumulate them until the command line arrives
        m = re.match(r"^\+ (\w+=\S*)$", ln)
        if m:
            pending.append(m.group(1))
            continue
        m = re.match(r"^\+ (.*python (?:bench\.py|benchmarks/\S+).*)$", ln)
        if m:
            env = " ".join(pending + [m.group(1)])
            pending = []
            continue
        if ln.startswith("+ "):
            pending = []
        if ln.startswith('{"metric"'):
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            tag = " ".join(t for t in env.split() if "=" in t and not t.startswith("timeout"))
            print(f"{d['value']:>9.3f} {d['unit']:<8} vs_baseline={d['vs_baseline']:<7} "
                  f"{d['metric']}  [{tag}]")
        elif re.match(r"^(=== |--- |\w[\w /]+ TF/s|SWEEP_DONE|Traceback)", ln):
            print(ln)


if __name__ == "__main__":
    main(*sys.argv[1:2])
