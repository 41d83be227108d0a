#!/usr/bin/env python
"""Run a REAL Spark standalone cluster on this box: one master + one worker
offering N cores, from which the master carves fixed-size executors — each
executor a separate JVM with its own python workers, shuffle files, and
sockets, exactly like a multi-node cluster (only the NIC is loopback).

This is the faithful sandbox stand-in for the north rule's two-cluster-size
criterion: ``local[N]`` vs ``local[4N]`` shares ONE JVM across all tasks
(GC, Arrow IPC, and the python-worker socket pump become global contention
that no real cluster has — measured in BENCH_SCALING.md), whereas 1 executor
vs 4 executors of identical shape scales the *number of engines*, holding
per-engine contention constant.

Usage (context manager or CLI):

    with LocalCluster(cores=16) as url:        # spark://127.0.0.1:7077
        spark = get_spark(master=url, cores=16,
                          extra_conf={"spark.executor.cores": "4",
                                      "spark.executor.memory": "6g"})

    python tools/local_cluster.py start --cores 16   # prints the URL
    python tools/local_cluster.py stop
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import time

RUN_DIR = "/tmp/spark-local-cluster"


def _spark_env() -> tuple[dict, str]:
    import pyspark

    home = pyspark.__path__[0]
    env = dict(os.environ)
    # the pip layout has jars/ but not the source-build dirs the launcher
    # probes for, so both of these must be pinned explicitly
    env["SPARK_HOME"] = home
    env["SPARK_SCALA_VERSION"] = "2.13"
    env["PYSPARK_PYTHON"] = sys.executable
    return env, os.path.join(home, "jars", "*")


def _wait_port(port: int, timeout: float = 30.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return
        time.sleep(0.3)
    raise TimeoutError(f"master port {port} never came up")


class LocalCluster:
    """Start/stop a master + single worker. ``pin_cpus`` tasksets the worker
    (and therefore every executor it forks) to CPUs ``0..cores-1``, so a
    4-core cluster really has 4 CPUs; the driver floats, as on a real
    cluster where it's a separate node."""

    def __init__(self, cores: int, memory_gb: int | None = None, port: int = 7077,
                 pin_cpus: bool = False, run_dir: str = RUN_DIR):
        self.cores = cores
        self.memory_gb = memory_gb or max(8, 6 * cores // 2)
        self.port = port
        self.pin_cpus = pin_cpus
        self.run_dir = run_dir
        self.procs: list[subprocess.Popen] = []

    @property
    def url(self) -> str:
        return f"spark://127.0.0.1:{self.port}"

    def start(self) -> str:
        env, cp = _spark_env()
        logs = os.path.join(self.run_dir, "logs")
        os.makedirs(logs, exist_ok=True)
        master_cmd = [
            "java", "-Xmx1g", "-cp", cp,
            "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", str(self.port), "--webui-port", "0",
        ]
        self.procs.append(
            subprocess.Popen(master_cmd, env=env,
                             stdout=open(f"{logs}/master.log", "w"),
                             stderr=subprocess.STDOUT)
        )
        _wait_port(self.port)
        worker_cmd = [
            "java", "-Xmx1g", "-cp", cp,
            "org.apache.spark.deploy.worker.Worker", self.url,
            "--cores", str(self.cores), "--memory", f"{self.memory_gb}g",
            "--webui-port", "0", "--work-dir", os.path.join(self.run_dir, "work"),
        ]
        if self.pin_cpus:
            cpus = "0" if self.cores == 1 else f"0-{self.cores - 1}"
            worker_cmd = ["taskset", "-c", cpus] + worker_cmd
        self.procs.append(
            subprocess.Popen(worker_cmd, env=env,
                             stdout=open(f"{logs}/worker.log", "w"),
                             stderr=subprocess.STDOUT)
        )
        # worker registration is fast once the master port is up
        time.sleep(3)
        return self.url

    def stop(self) -> None:
        for p in reversed(self.procs):
            p.terminate()
        for p in reversed(self.procs):
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        self.procs.clear()

    def __enter__(self) -> str:
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def _cli() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    st = sub.add_parser("start")
    st.add_argument("--cores", type=int, default=16)
    st.add_argument("--memory-gb", type=int)
    st.add_argument("--port", type=int, default=7077)
    st.add_argument("--pin", action="store_true")
    sub.add_parser("stop")
    args = ap.parse_args()
    pid_file = os.path.join(RUN_DIR, "pids")
    if args.cmd == "start":
        c = LocalCluster(args.cores, args.memory_gb, args.port, args.pin)
        url = c.start()
        os.makedirs(RUN_DIR, exist_ok=True)
        with open(pid_file, "w") as f:
            f.write("\n".join(str(p.pid) for p in c.procs))
        # the daemons keep running after this CLI exits
        print(url)
    else:
        if os.path.exists(pid_file):
            for pid in open(pid_file).read().split():
                try:
                    os.kill(int(pid), signal.SIGTERM)
                except ProcessLookupError:
                    pass
            os.remove(pid_file)


if __name__ == "__main__":
    _cli()
