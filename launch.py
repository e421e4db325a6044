#!/usr/bin/env python3
"""Per-host multi-process launcher (SURVEY §2.10 launcher row).

The reference launches with bash + CUDA_VISIBLE_DEVICES and Torque/PBS
YAML confs (eval_all.sh / run_confs/*.yaml); the TPU equivalent is one
process per host that calls ``jax.distributed.initialize`` before any
device work. This launcher owns that contract — it exports
``RMVD_TPU_COORDINATOR`` / ``RMVD_TPU_NUM_PROCESSES`` /
``RMVD_TPU_PROCESS_ID`` and the CLIs initialize via
``robustmvd_tpu.parallel.mesh.init_distributed_from_env()``.

Modes
-----
Per-host (real TPU pod slices — run ONE launch.py per host, e.g. from a
scheduler template or ``gcloud ... ssh --worker=all``)::

    python launch.py --coordinator 10.0.0.2:8476 --num_processes 4 \
        --process_id $WORKER_ID -- train.py --training_type mvd ...

Autodetect (Cloud TPU pods populate the topology env themselves)::

    python launch.py --auto -- train.py ...

Local emulation (N processes on this machine, virtual CPU devices —
the multi-host test path; no TPU required)::

    python launch.py --local 2 --devices_per_process 2 -- script.py args

Exit code is 0 iff every process exits 0. Run-conf YAML workflows keep
working unchanged: run_conf.py builds the train.py command line and this
launcher wraps it per host.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import tempfile
import time


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_cmd(argv):
    cmd = [sys.executable] + argv
    return cmd


def run_local(args, script_argv):
    """Spawn ``--local N`` emulation processes with CPU devices."""
    coord = f"127.0.0.1:{_free_port()}"
    env_base = dict(os.environ)
    # The TPU-tunnel sitecustomize initializes a backend at interpreter
    # start; drop its gate and force the CPU platform so each process owns
    # independent virtual devices (same setup as tests/test_multihost.py).
    env_base.pop("PALLAS_AXON_POOL_IPS", None)
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = (
        env_base.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_process}"
    ).strip()

    # Children write to temp files, not PIPEs: with a sequential
    # communicate() drain, a lockstep distributed child that fills its 64KB
    # pipe buffer would block mid-collective and stall the whole group.
    procs = []
    logs = []
    for pid in range(args.local):
        env = dict(env_base)
        env["RMVD_TPU_COORDINATOR"] = coord
        env["RMVD_TPU_NUM_PROCESSES"] = str(args.local)
        env["RMVD_TPU_PROCESS_ID"] = str(pid)
        log = tempfile.TemporaryFile()
        logs.append(log)
        procs.append(
            subprocess.Popen(
                _child_cmd(script_argv),
                env=env,
                stdout=log,
                stderr=subprocess.STDOUT,
            )
        )

    rc = 0
    deadline = time.monotonic() + args.timeout
    for pid, p in enumerate(procs):
        try:
            p.wait(timeout=max(0.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            rc = 124
            print(f"[launch] process {pid} timed out", file=sys.stderr)
            break
    for pid, (p, log) in enumerate(zip(procs, logs)):
        if p.poll() is None:
            p.wait()
        log.seek(0)
        out = log.read()
        log.close()
        sys.stdout.write(
            "".join(
                f"[proc {pid}] {line}\n"
                for line in out.decode(errors="replace").splitlines()
            )
        )
        if rc != 124 and p.returncode != 0:
            rc = p.returncode
            print(f"[launch] process {pid} exited {p.returncode}", file=sys.stderr)
    return rc


def run_per_host(args, script_argv):
    """Export the distributed contract and exec the script on THIS host."""
    env = dict(os.environ)
    if args.auto:
        env["RMVD_TPU_DIST_AUTO"] = "1"
    else:
        env["RMVD_TPU_COORDINATOR"] = args.coordinator
        env["RMVD_TPU_NUM_PROCESSES"] = str(args.num_processes)
        env["RMVD_TPU_PROCESS_ID"] = str(args.process_id)
    os.execvpe(sys.executable, _child_cmd(script_argv), env)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    mode = parser.add_mutually_exclusive_group(required=True)
    mode.add_argument("--local", type=int, metavar="N",
                      help="spawn N emulation processes on this machine (CPU devices)")
    mode.add_argument("--coordinator", metavar="HOST:PORT",
                      help="coordinator address for per-host mode")
    mode.add_argument("--auto", action="store_true",
                      help="rely on jax.distributed.initialize autodetection (Cloud TPU pods)")
    parser.add_argument("--num_processes", type=int, default=1)
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument("--devices_per_process", type=int, default=1,
                        help="virtual CPU devices per --local process")
    parser.add_argument("--timeout", type=float, default=1800.0,
                        help="--local mode: seconds before killing children")
    parser.add_argument("script", nargs=argparse.REMAINDER,
                        help="-- script.py [script args...]")
    args = parser.parse_args(argv)

    script_argv = args.script
    if script_argv and script_argv[0] == "--":
        script_argv = script_argv[1:]
    if not script_argv:
        parser.error("no script given (usage: launch.py <mode> -- script.py ...)")

    if args.local:
        return run_local(args, script_argv)
    return run_per_host(args, script_argv)


if __name__ == "__main__":
    sys.exit(main())
