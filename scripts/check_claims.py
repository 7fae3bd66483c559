"""Claims guard: every committed measurement artifact that cites a model
must be backed by persisted weights (VERDICT r4 task 1: "a guard that
fails loudly when a table cites a model with no committed weights").

The mechanical link: planning-sweep / selection / restart-protocol JSONs
under artifacts/ carry the run(s) they measured; for each cited run this
script requires a ckpt_*.npz for that run under ckpts/<run>/ that is
either tracked by git or staged on disk ready to be committed.  Exits 1
and prints every violation.

Run directly (`python scripts/check_claims.py`) or via the test suite
(tests/test_repo.py wraps it).
"""
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cited_runs():
    """Run names cited by committed artifacts, with the citing file."""
    cites = []
    for path in glob.glob(os.path.join(REPO, "artifacts", "*", "*.json")):
        try:
            d = json.load(open(path))
        except Exception:
            continue
        rel = os.path.relpath(path, REPO)
        if isinstance(d, dict):
            # plan_* sweeps / diagnostics: {"run": "runs/<name>", ...}
            r = d.get("run")
            if isinstance(r, str):
                cites.append((os.path.basename(r.rstrip("/")), rel))
            # grav_select: {"runs/<name>": {...}, ...}
            for k in d:
                if isinstance(k, str) and k.startswith("runs/"):
                    cites.append((os.path.basename(k.rstrip("/")), rel))
            # restart_protocol: {"slot": {"final_run": "<name>"}}
            for v in d.values():
                if isinstance(v, dict) and isinstance(
                        v.get("final_run"), str):
                    cites.append((v["final_run"], rel))
    return cites


def has_weights(name):
    on_disk = glob.glob(os.path.join(REPO, "ckpts", name, "ckpt_*.npz"))
    if on_disk:
        return True
    try:
        out = subprocess.run(
            ["git", "ls-files", f"ckpts/{name}/"],
            cwd=REPO, capture_output=True, text=True).stdout
        return any(ln.endswith(".npz") for ln in out.splitlines())
    except Exception:
        return False


def main():
    missing = []
    for name, src in sorted(set(cited_runs())):
        if not has_weights(name):
            missing.append((name, src))
    if missing:
        print("CLAIMS GUARD FAILED — artifacts cite models with no "
              "persisted weights:", file=sys.stderr)
        for name, src in missing:
            print(f"  {name}  (cited by {src}; expected "
                  f"ckpts/{name}/ckpt_*.npz)", file=sys.stderr)
        return 1
    n = len(set(cited_runs()))
    print(f"claims guard ok: {n} artifact-cited model(s) all have "
          f"persisted weights")
    return 0


if __name__ == "__main__":
    sys.exit(main())
