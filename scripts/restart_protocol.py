"""Pre-registered early-restart protocol for resistant seeds (VERDICT r4
task 5).

Round 3's recipes each topped out at 4/5 seeds because one seed per task
sits in a resistant basin, and built the early detectors without closing
the loop.  This driver closes it.  Protocol (registered BEFORE the round-4
runs; thresholds from the round-3 trajectories):

* billiards (360 ep, anneal->1%, K=4 overshoot):
    stage 1 = 240 epochs (the anneal schedule pinned to the FULL 360x20
    steps via absolute debug_anneal_lr, so stage splitting never changes
    the schedule).  TRIGGER: mean train `overshoot` over the last 10
    logged epochs of stage 1 > 0.010 (round-3 separation at epoch ~240:
    basin seeds <= 0.0074, plateau seeds >= 0.0147 — mid-anneal epoch-120
    values do NOT separate: s13 sat at 0.0162 and still reached 0.0054).
    Trip -> abandon, restart fresh with seed+10.  Pass -> resume to 360.
* gravity (260 ep, w16/K12 sampled overshoot, sigma head):
    stage 1 = 20 epochs.  TRIGGER: first joint-phase eval detect_mse >
    0.05 (healthy ~0.007, collapsed ~0.15; the trainer's own early-warn
    threshold).  Trip -> restart with seed+10.  Pass -> resume to 260.
* max 2 restarts per slot; success = billiards mse@8 <= 0.015 /
  gravity final val speed_ratio in [0.8, 1.2].

Usage:
  python scripts/restart_protocol.py billiards 15 16 17 18 19
  python scripts/restart_protocol.py gravity  30 31 32 33 34

Writes runs/restart_protocol_<task>.json incrementally.
"""
import json
import os
import subprocess
import sys

REPO = "/root/repo"

BIL = ("preset=stove_billiards steps_per_epoch=20 debug_anneal_lr=7200 "
       "anneal_final=0.01 eval_every=60 ckpt_every=240 "
       "fused_epoch=false").split()
# steps_per_epoch=20 is load-bearing: the round-3 recipe is 360 ep x 20
# steps (r3_queue1.sh), and debug_anneal_lr=7200 pins the anneal to that
# absolute step count.  The first round-5 protocol run omitted it, so the
# preset default (num_train//batch = 3 steps/ep) trained only ~720 of the
# 7200 schedule steps per attempt — every attempt "tripped" with
# overshoot 0.022-0.033 and mse@8 ~0.09 (quarantined as
# artifacts/r5/restart_protocol_billiards_INVALID_stepbug.json).
GRAV = ("preset=stove_gravity steps_per_epoch=20 window=16 overshoot_k=12 "
        "overshoot_sample=true open_loop_sigma=true eval_every=20 "
        "ckpt_every=20 ckpt_keep=99 eval_longhorizon=80 "
        "debug_anneal_lr=5200 fused_epoch=false").split()

SPEC = {
    "billiards": dict(common=BIL, stage1=240, total=360,
                      timeout1=3600, timeout2=2700),
    "gravity": dict(common=GRAV, stage1=20, total=260,
                    timeout1=1800, timeout2=5400),
}


def run_cmd(args, timeout):
    print("+ " + " ".join(args), flush=True)
    try:
        return subprocess.run(args, cwd=REPO, timeout=timeout,
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL).returncode
    except subprocess.TimeoutExpired:
        # record the attempt as failed instead of killing the whole
        # multi-slot protocol (tunnel stalls of ~15 min are known)
        print(f"! timeout after {timeout}s", flush=True)
        return 124


def train(common, overrides, timeout):
    return run_cmd(["python", "-m", "stove_tpu.main"] + common + overrides,
                   timeout)


def metrics(run):
    rows = []
    path = os.path.join(REPO, "runs", run, "metrics.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
    return rows


def trigger_billiards(run, stage1):
    """Mean train overshoot over the last 10 epochs of stage 1."""
    ov = [r["overshoot"] for r in metrics(run)
          if r.get("kind") == "train" and "overshoot" in r
          and stage1 - 10 <= r.get("epoch", -1) < stage1]
    val = sum(ov) / max(len(ov), 1) if ov else float("inf")
    return val > 0.010, val


def trigger_gravity(run, stage1):
    """detect_mse at the first joint-phase eval."""
    ev = [r for r in metrics(run)
          if r.get("kind") == "eval" and "detect_mse" in r]
    val = ev[0]["detect_mse"] if ev else float("inf")
    return val > 0.05, val


def main():
    task = sys.argv[1]
    seeds = [int(s) for s in sys.argv[2:]]
    spec = SPEC[task]
    trig = trigger_billiards if task == "billiards" else trigger_gravity
    out_path = os.path.join(REPO, f"runs/restart_protocol_{task}.json")
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))

    for slot in seeds:
        key = str(slot)
        if key in results and results[key].get("final_run"):
            print(f"[slot {slot}] already done, skipping", flush=True)
            continue
        entry = {"attempts": []}
        seed = slot
        for attempt in range(3):                      # initial + 2 restarts
            run = f"r4rp_{task[:4]}_s{seed}"
            print(f"=== slot {slot} attempt {attempt}: seed {seed} "
                  f"({run}) ===", flush=True)
            rc = train(spec["common"],
                       [f"seed={seed}", f"run_name={run}",
                        f"num_epochs={spec['stage1']}"], spec["timeout1"])
            tripped, val = trig(run, spec["stage1"])
            entry["attempts"].append(
                {"seed": seed, "run": run, "stage1_rc": rc,
                 "trigger_value": val, "tripped": bool(tripped)})
            results[key] = entry
            json.dump(results, open(out_path, "w"), indent=1)
            if not tripped:
                rc2 = train([], [f"restore=runs/{run}",
                                 f"num_epochs={spec['total']}"],
                            spec["timeout2"])
                entry["attempts"][-1]["stage2_rc"] = rc2
                entry["final_run"] = run
                entry["restarts_used"] = attempt
                json.dump(results, open(out_path, "w"), indent=1)
                break
            print(f"[slot {slot}] TRIGGER tripped ({val:.4f}) -> restart",
                  flush=True)
            seed += 10
        else:
            entry["final_run"] = None                 # 3 strikes
            json.dump(results, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
