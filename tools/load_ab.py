#!/usr/bin/env python3
"""Loaded-box A/B for the load/HTTP focal referee (round 17).

Method — mirrors BENCH_AB_LOADED_r16.json's catalog-pass A/B, one axis
over: induce host load (N busy-loop processes), run the bench's load
sections only (SPARK_GRAFT_SECTIONS=load) twice — arm A with the focal
referee (default), arm B with SPARK_GRAFT_LOAD_FOCAL=0 — and compare
each arm's min-over-shapes q/s headlines against the clean committed
values in BENCH_BEST.json. Writes BENCH_AB_LOAD_r17.json with both
arms' headline fields, the per-arm focal disclosures, and the clean
reference, so the artifact itself carries the evidence that the policy
(not cherry-picking) closed the gap.

Usage: python3 tools/load_ab.py [n_spinners]
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg1():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def spin(n):
    procs = []
    for _ in range(n):
        procs.append(subprocess.Popen(
            ["python3", "-c", "while True: pass"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    return procs


def run_arm(name, extra_env):
    env = dict(os.environ)
    env["SPARK_GRAFT_SECTIONS"] = "load"
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.update(extra_env)
    # remove the previous arm's artifact FIRST: a crashed arm must fail
    # loudly here, not silently republish the other arm's numbers as its
    # own (review r17)
    art_path = os.path.join(REPO, "target/bench.json")
    if os.path.exists(art_path):
        os.remove(art_path)
    t0 = time.time()
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=REPO, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, check=False)
    if not os.path.exists(art_path):
        raise RuntimeError(f"arm {name}: bench produced no artifact (crashed?)")
    with open(art_path) as f:
        art = json.load(f)
    keep = ["load_min_shape_qps", "load_min_shape_qps_first_attempt",
            "load_min_shape_qps_prefocal", "load_per_shape_qps", "load_errors",
            "focal_load", "load_http_min_qps", "load_http_min_qps_prefocal",
            "load_http_per_shape", "focal_http", "load_http_errors"]
    out = {k: art.get(k) for k in keep}
    out["wall_sec"] = round(time.time() - t0, 1)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    with open(os.path.join(REPO, "BENCH_BEST.json")) as f:
        best = json.load(f)
    clean = {
        "artifact": "BENCH_BEST.json",
        "load_min_shape_qps": best.get("load_min_shape_qps"),
        "load_http_min_qps": best.get("load_http_min_qps"),
    }
    procs = spin(n)
    time.sleep(30)  # let load1 climb into the contended regime
    result = {"metric": "load_ab", "spinners": n, "load1_at_start": loadavg1(),
              "clean_reference": clean}
    try:
        result["arm_focal"] = run_arm("focal", {})
        result["load1_between"] = loadavg1()
        result["arm_nofocal"] = run_arm("nofocal", {"SPARK_GRAFT_LOAD_FOCAL": "0"})
        result["load1_at_end"] = loadavg1()
    finally:
        for p in procs:
            p.send_signal(signal.SIGKILL)
    out = os.path.join(REPO, "BENCH_AB_LOAD_r17.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result.get(k) for k in
                      ["load1_at_start", "load1_between", "load1_at_end"]}))
    for arm in ["arm_focal", "arm_nofocal"]:
        a = result[arm]
        print(arm, "shape_min", a["load_min_shape_qps"],
              "prefocal", a["load_min_shape_qps_prefocal"],
              "http_min", a["load_http_min_qps"],
              "http_prefocal", a["load_http_min_qps_prefocal"],
              "errors", a["load_errors"], a["load_http_errors"])
    print("wrote", out)


if __name__ == "__main__":
    main()
