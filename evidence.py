"""One-command evidence harness: regenerate every BENCH_* artifact with
environment metadata stamped in, so a round can't end with
staged-but-unrecorded numbers scattered across five commands (VERDICT r3
ask 8). The analog of the reference's one-command `make check` contract
(reference Makefile:30-32), extended to performance evidence.

    python evidence.py --tag r04          # or: make evidence TAG=r04

Probes the TPU tunnel first (subprocess + hard timeout: a dead axon
tunnel hangs any process that touches the backend). Chip-dependent
artifacts run only when the probe succeeds; CPU-side artifacts always
run. Every artifact's status (ok / failed / blocked) lands in
EVIDENCE_<tag>.json together with the device, git commit, and wall time
— the manifest is the round's evidence index.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent

# artifact name -> (command, needs_tpu, timeout_s). Commands print JSON
# lines on stdout; stdout is teed to the artifact file verbatim.
ARTIFACTS = {
    "BENCH_{tag}.json":         ([sys.executable, "bench.py"], True, 3600),
    "BENCH_KERNELS_{tag}.json": ([sys.executable, "bench_kernels.py"],
                                 True, 5400),
    "BENCH_ALL_{tag}.json":     ([sys.executable, "bench_all.py"],
                                 True, 7200),
    "ROOFLINE_{tag}.json":      ([sys.executable,
                                  "artifacts/exp_roofline.py"],
                                 True, 3600),
    "BENCH_SCALING_{tag}.json": ([sys.executable, "bench_scaling.py"],
                                 False, 3600),
    # --cpu is swapped out at runtime when the TPU probe succeeds (the
    # ours-side rows then run on the chip; the reference rows are host
    # CPU either way)
    "BENCH_CPU_REF.json":       ([sys.executable, "bench_cpu_ref.py",
                                  "--cpu"], False, 7200),
}

# The <=10-minute default tier (VERDICT r4 ask 7: the full matrix needs
# ~2.5 h and a flaky tunnel can orphan a round's artifacts; the quick
# tier lands the headline + the gated kernel rows + the multichip dryrun
# first, and --full adds the rest).
QUICK_ARTIFACTS = {
    "BENCH_{tag}.json":         ([sys.executable, "bench.py"], True, 900),
    "BENCH_KERNELS_LITE_{tag}.json": (
        [sys.executable, "bench_kernels.py", "--lite"], True, 900),
    "MULTICHIP_LOCAL_{tag}.json": (
        [sys.executable, "-c",
         "import json, os; "
         "os.environ['JAX_PLATFORMS']='cpu'; "
         "os.environ['XLA_FLAGS']="
         "'--xla_force_host_platform_device_count=8'; "
         "import __graft_entry__ as g; g.dryrun_multichip(8); "
         "print(json.dumps({'ok': True, 'devices': 8}))"],
        False, 900),
}


def probe_tpu(timeout_s: int = 240):
    """Return (ok, device_kind). Runs in a subprocess: when the tunnel is
    down the axon PJRT client blocks forever in a C-level connect-retry
    loop that no Python-level timeout can interrupt."""
    code = ("import jax; d = jax.devices(); "
            "print(d[0].device_kind if d else 'none')")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return False, "tunnel timeout"
    if out.returncode != 0:
        return False, (out.stderr or "probe failed").strip()[-200:]
    return True, out.stdout.strip().splitlines()[-1]


def git_commit():
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              cwd=REPO).stdout.strip()
    except Exception:
        return "unknown"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None,
                    help="artifact tag, e.g. r04 (default: rXX from the "
                         "latest existing BENCH_rNN.json + 1)")
    ap.add_argument("--only", default=None,
                    help="comma-separated artifact-name substrings to run")
    ap.add_argument("--skip-tpu", action="store_true",
                    help="treat the chip as unavailable without probing")
    ap.add_argument("--full", action="store_true",
                    help="run the full ~2.5 h artifact matrix; default "
                         "is the <=10 min quick tier (headline + "
                         "kernels-lite + multichip dryrun)")
    args = ap.parse_args()

    tag = args.tag
    if tag is None:
        rounds = [int(p.stem.split("_r")[-1])
                  for p in REPO.glob("BENCH_r[0-9]*.json")]
        tag = f"r{(max(rounds) + 1 if rounds else 1):02d}"

    # Warm the one-time on-demand g++ build of the native symbolic
    # library so no artifact's timed region pays it (round 4's
    # analyze_ms=3937 was this once-per-checkout toolchain step).
    subprocess.run(
        [sys.executable, "-c",
         "from libdogleg_tpu.native.loader import native_available; "
         "native_available()"],
        cwd=REPO, capture_output=True, timeout=300)

    if args.skip_tpu:
        tpu_ok, device = False, "skipped by flag"
    else:
        tpu_ok, device = probe_tpu()
    manifest = {
        "tag": tag,
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "git_commit": git_commit(),
        "tpu_available": tpu_ok,
        "device": device,
        "host_cores": os.cpu_count(),
        "artifacts": {},
    }
    print(json.dumps({"evidence": tag, "tpu": tpu_ok, "device": device}))

    artifacts = ARTIFACTS if args.full else QUICK_ARTIFACTS
    manifest["tier"] = "full" if args.full else "quick"
    for name_tpl, (cmd, needs_tpu, timeout_s) in artifacts.items():
        name = name_tpl.format(tag=tag)
        if "bench_cpu_ref.py" in " ".join(cmd) and tpu_ok:
            cmd = [c for c in cmd if c != "--cpu"]
        if args.only and not any(s in name for s in args.only.split(",")):
            manifest["artifacts"][name] = {"status": "skipped",
                                           "why": "--only filter"}
            continue
        if needs_tpu and not tpu_ok:
            manifest["artifacts"][name] = {
                "status": "blocked",
                "why": f"TPU unavailable ({device})",
                "command": " ".join(cmd)}
            print(json.dumps({"artifact": name, "status": "blocked"}))
            continue
        t0 = time.time()
        stderr_tail = ""
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout_s, cwd=REPO)
            status = "ok" if out.returncode == 0 else "failed"
            body = out.stdout
            stderr_tail = (out.stderr or "")[-500:]
        except subprocess.TimeoutExpired as e:
            status = "timeout"
            body = e.stdout or ""
            if isinstance(body, bytes):
                body = body.decode(errors="replace")
        wall = round(time.time() - t0, 1)
        if body.strip():
            (REPO / name).write_text(body)
        manifest["artifacts"][name] = {
            "status": status, "wall_s": wall, "command": " ".join(cmd),
            **({} if status == "ok" else {"stderr_tail": stderr_tail})}
        print(json.dumps({"artifact": name, "status": status,
                          "wall_s": wall}))

    mpath = REPO / f"EVIDENCE_{tag}.json"
    mpath.write_text(json.dumps(manifest, indent=1) + "\n")
    print(json.dumps({"manifest": str(mpath.name),
                      "ok": all(a["status"] in ("ok", "skipped")
                                for a in manifest["artifacts"].values())}))


if __name__ == "__main__":
    main()
