"""Local Spark standalone cluster: 1 master + K workers, each worker pinned
to its own disjoint core set with ``taskset``.

This is the sandbox's faithful model of a real multi-executor deployment
(the north rule's "spark-submit --py-files on a multi-executor cluster"):
every executor is a separate 8-core JVM regardless of cluster size, so
comparing a 1-worker app against a 4-worker app measures *cluster* scaling
— scheduler + shuffle-fetch + executor fan-out — rather than how well one
JVM tolerates 32 threads (local[32] conflates the two; measured on this
box, one 32-thread JVM delivers ~half the aggregate throughput of four
independent 8-core JVMs doing identical work).

Pinning makes a worker behave like its own machine: its executor (and the
executor's Python workers, which inherit the affinity mask) can never
borrow a neighbour's idle cores, so an 8-core job measures 8 cores whether
or not the rest of the box is busy.

Master runs with ``spark.deploy.spreadOut=false`` (consolidate) so an app
with ``spark.cores.max=8`` lands entirely on ONE worker, and 4 concurrent
such apps land on 4 distinct workers.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import urllib.request

import pyspark

SPARK_HOME = os.path.dirname(os.path.abspath(pyspark.__file__))
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
MASTER_HOST = "127.0.0.1"
MASTER_PORT = 7077
MASTER_WEBUI = 8090
MASTER_URL = f"spark://{MASTER_HOST}:{MASTER_PORT}"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scratch_base() -> str:
    return "/dev/shm" if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK) \
        else "/tmp"


class StandaloneCluster:
    def __init__(self, n_workers: int = 4, cores_per_worker: int = 8,
                 worker_mem: str = "14g"):
        self.n_workers = n_workers
        self.cores_per_worker = cores_per_worker
        self.worker_mem = worker_mem
        self.procs: list[subprocess.Popen] = []
        self.dirs: list[str] = []

    def _env(self, extra: dict[str, str]) -> dict:
        env = dict(os.environ)
        env.update({
            "SPARK_HOME": SPARK_HOME,
            "PYSPARK_PYTHON": sys.executable,
            "PYTHONPATH": REPO,
            "SPARK_NO_DAEMONIZE": "1",
        })
        env.update(extra)
        return env

    def start(self) -> str:
        base = _scratch_base()
        mlog = open(os.path.join(base, "spark-master.log"), "w")
        self.procs.append(subprocess.Popen(
            [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
             "--host", MASTER_HOST, "--port", str(MASTER_PORT),
             "--webui-port", str(MASTER_WEBUI)],
            env=self._env({
                "SPARK_MASTER_OPTS": "-Dspark.deploy.spreadOut=false",
            }),
            stdout=mlog, stderr=subprocess.STDOUT,
        ))
        self._wait_master()
        for i in range(self.n_workers):
            lo = i * self.cores_per_worker
            hi = lo + self.cores_per_worker - 1
            wdir = os.path.join(base, f"spark-worker-{i}")
            ldir = os.path.join(base, f"spark-local-w{i}")
            shutil.rmtree(wdir, ignore_errors=True)
            shutil.rmtree(ldir, ignore_errors=True)
            os.makedirs(wdir, exist_ok=True)
            os.makedirs(ldir, exist_ok=True)
            self.dirs += [wdir, ldir]
            wlog = open(os.path.join(base, f"spark-worker-{i}.log"), "w")
            self.procs.append(subprocess.Popen(
                ["taskset", "-c", f"{lo}-{hi}",
                 SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                 "--cores", str(self.cores_per_worker),
                 "--memory", self.worker_mem,
                 "--work-dir", wdir, "--webui-port", "0", MASTER_URL],
                env=self._env({"SPARK_LOCAL_DIRS": ldir}),
                stdout=wlog, stderr=subprocess.STDOUT,
            ))
        self._wait_workers()
        return MASTER_URL

    def _wait_master(self, timeout: float = 60.0) -> None:
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            try:
                self._status()
                return
            except Exception:
                time.sleep(1.0)
        raise RuntimeError("standalone master did not come up")

    def _status(self) -> dict:
        with urllib.request.urlopen(
                f"http://{MASTER_HOST}:{MASTER_WEBUI}/json/", timeout=5) as r:
            return json.loads(r.read())

    def _wait_workers(self, timeout: float = 90.0) -> None:
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            try:
                st = self._status()
                alive = [w for w in st.get("workers", [])
                         if w.get("state") == "ALIVE"]
                if len(alive) >= self.n_workers:
                    return
            except Exception:
                pass
            time.sleep(1.0)
        raise RuntimeError(f"{self.n_workers} workers did not register")

    def stop(self) -> None:
        for p in reversed(self.procs):
            p.terminate()
        for p in reversed(self.procs):
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()
        self.procs.clear()
        for d in self.dirs:
            shutil.rmtree(d, ignore_errors=True)
        self.dirs.clear()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        return False
