#!/usr/bin/env python3
"""Diagnose encode/build scaling between 2 and 8 single-core executors.

The round-5 bench recorded raw scaling efficiency 0.642 (encode) and 0.326
(build) between local-cluster[2,1] and local-cluster[8,1], while the bare
numpy encode-kernel op mix scales at 0.958 on the same process counts — so
the gap is Spark-side, not the memory bus. This probe re-runs the timed
stages with spark.eventLog enabled and breaks each stage down by
task-metric component (executor run/CPU time, JVM GC, shuffle fetch wait,
shuffle write time, deserialize, scheduler delay) at both widths so the
non-scaling component is identifiable instead of guessed.

Usage:  python experiments/scale_probe.py            # orchestrate both widths
        python experiments/scale_probe.py --leg N ARGS OUT   # internal
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _leg(nexec: int, tdir: str, pyzip: str, evdir: str, out_path: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    shm = tempfile.mkdtemp(prefix="probe_shuffle_", dir="/dev/shm")
    os.environ["SPARK_LOCAL_DIRS"] = shm
    malloc_env = {}
    pool = os.environ.get("PROBE_ARROW_POOL")
    if pool:
        # pyarrow reads ARROW_DEFAULT_MEMORY_POOL at import: the bundled
        # jemalloc (the 16.x Linux default) decays dirty pages back to the
        # OS within ~1 s, so every Arrow batch re-faults fresh zeroed pages
        # through the host allocator — the exact channel the round-5
        # variance investigation measured at 0.12-1.2 GB/s first-touch.
        # mimalloc retains freed pages for reuse; this knob measures
        # whether pool choice moves the supply-bound wide leg.
        malloc_env["ARROW_DEFAULT_MEMORY_POOL"] = pool
        os.environ["ARROW_DEFAULT_MEMORY_POOL"] = pool
    if os.environ.get("PROBE_MALLOC_TUNE") == "1":
        # glibc: keep large numpy temporaries on the heap for reuse instead
        # of mmap/munmap per allocation (fresh-page faults + zeroing were
        # ~50% of kernel-side cost in the bare calibration)
        malloc_env = {
            "MALLOC_MMAP_THRESHOLD_": "134217728",
            "MALLOC_TRIM_THRESHOLD_": "268435456",
        }
        os.environ.update(malloc_env)
    b = (
        SparkSession.builder.master(f"local-cluster[{nexec},1,6144]")
        .appName(f"probe_{nexec}")
        .config("spark.executor.memory", "6g")
        .config("spark.local.dir", shm)
        .config("spark.submit.pyFiles", pyzip)
        .config("spark.sql.shuffle.partitions", str(max(nexec * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", "file:" + evdir)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in malloc_env.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    s = b.getOrCreate()
    sc = s.sparkContext
    sc.setLogLevel("ERROR")
    sc.addPyFile(pyzip)

    from splade_spark.bm25 import quantization_scale
    from splade_spark.index.build import build_index, build_postings

    # prewarm python worker pool
    s.range(0, 1024, 1, nexec * 2).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).count()

    w = s.read.parquet(tdir + "/scale_w4").cache()
    w.count()
    scale = quantization_scale(w)
    sc.setJobGroup("warm", "warm")
    build_postings(w, scale, num_shards=32).agg(F.sum("n")).collect()

    marks: dict[str, float] = {}
    stat_samples: list[tuple[float, list[int]]] = []
    stop_flag = []

    def _stat():
        with open("/proc/stat") as fh:
            return list(map(int, fh.readline().split()[1:9]))

    def _sampler():
        while not stop_flag:
            stat_samples.append((time.time(), _stat()))
            time.sleep(2)

    import threading

    th = threading.Thread(target=_sampler, daemon=True)
    th.start()

    windows: dict[str, tuple[float, float]] = {}

    def timed(name, fn):
        sc.setJobGroup(name, name)
        t0 = time.time()
        fn()
        t1 = time.time()
        marks[name] = round(t1 - t0, 3)
        windows[name] = (t0, t1)

    for i in range(2):
        timed(
            f"encode{i}",
            lambda: build_postings(w, scale, num_shards=32)
            .agg(F.sum("n"))
            .collect(),
        )
    idx = tempfile.mkdtemp(prefix="probe_idx_", dir=shm)
    timed(
        "build",
        lambda: build_index(w, idx + "/x", scale, num_shards=32, resume=False),
    )
    app_id = sc.applicationId
    s.stop()
    stop_flag.append(1)
    import shutil

    shutil.rmtree(shm, ignore_errors=True)

    # per-mark window: average whole-box CPU busy/steal during the window
    def window_stats(t0, t1):
        pts = [(t, v) for t, v in stat_samples if t0 - 2 <= t <= t1 + 2]
        if len(pts) < 2:
            return None
        d = [b - a for a, b in zip(pts[0][1], pts[-1][1])]
        tot = sum(d) or 1
        # fields: user nice system idle iowait irq softirq steal
        return {
            "user_pct": round((d[0] + d[1]) / tot * 100, 1),
            "sys_pct": round(d[2] / tot * 100, 1),
            "idle_pct": round(d[3] / tot * 100, 1),
            "iowait_pct": round(d[4] / tot * 100, 1),
            "steal_pct": round(d[7] / tot * 100, 1),
        }

    cpu_windows = {k: window_stats(*w) for k, w in windows.items()}
    with open(out_path, "w") as fh:
        json.dump(
            {"marks": marks, "app_id": app_id, "cpu_windows": cpu_windows}, fh
        )


def _evlog_lines(path: str):
    """Yield event-log JSON lines: plain file, or Spark's rolled
    eventlog_v2_<app> directory with zstd-compressed event files."""
    import glob
    import subprocess

    if os.path.isfile(path):
        with open(path) as fh:
            yield from fh
        return
    d = path if os.path.isdir(path) else None
    if d is None:
        cands = glob.glob(path + "*") + glob.glob(
            os.path.join(os.path.dirname(path), "eventlog_v2_" + os.path.basename(path))
        )
        dirs = [c for c in cands if os.path.isdir(c)]
        if not dirs:
            raise FileNotFoundError(path)
        d = dirs[0]
    for f in sorted(glob.glob(os.path.join(d, "events_*"))):
        if f.endswith(".zstd"):
            out = subprocess.run(["zstd", "-dc", f], capture_output=True, check=True)
            yield from out.stdout.decode().splitlines()
        else:
            with open(f) as fh:
                yield from fh


def _parse_evlog(path: str) -> dict:
    """Aggregate task metrics per job group from one event log."""
    stage_group: dict[int, str] = {}
    stage_wall: dict[int, list[float]] = {}
    agg: dict[str, dict[str, float]] = {}
    if True:
        for line in _evlog_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "?")
                for sid in ev.get("Stage IDs", []):
                    stage_group[sid] = grp
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub, com = si.get("Submission Time"), si.get("Completion Time")
                if sub and com:
                    stage_wall.setdefault(si["Stage ID"], []).append(
                        (com - sub) / 1e3
                    )
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                grp = stage_group.get(sid, "?")
                tm = ev.get("Task Metrics") or {}
                ti = ev.get("Task Info") or {}
                for a in (
                    agg.setdefault(grp, {}),
                    agg.setdefault(f"{grp}/s{sid}", {}),
                ):
                    _accum(a, tm, ti)
    for a in agg.values():
        for k in list(a):
            a[k] = round(a[k], 1)
    return agg


def _accum(a: dict, tm: dict, ti: dict) -> None:
    def add(k, v):
        a[k] = a.get(k, 0.0) + v

    run = tm.get("Executor Run Time", 0)
    add("run_ms", run)
    add("cpu_ms", tm.get("Executor CPU Time", 0) / 1e6)
    add("gc_ms", tm.get("JVM GC Time", 0))
    add("deser_ms", tm.get("Executor Deserialize Time", 0))
    add("result_ser_ms", tm.get("Result Serialization Time", 0))
    srm = tm.get("Shuffle Read Metrics") or {}
    add("fetch_wait_ms", srm.get("Fetch Wait Time", 0))
    add(
        "shuffle_read_mb",
        (srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0))
        / 1e6,
    )
    swm = tm.get("Shuffle Write Metrics") or {}
    add("shuffle_write_ms", swm.get("Shuffle Write Time", 0) / 1e6)
    add("shuffle_write_mb", swm.get("Shuffle Bytes Written", 0) / 1e6)
    launch, finish = ti.get("Launch Time"), ti.get("Finish Time")
    if launch and finish:
        wall = finish - launch
        add("task_wall_ms", wall)
        add(
            "sched_gap_ms",
            max(
                0,
                wall
                - run
                - tm.get("Executor Deserialize Time", 0)
                - tm.get("Result Serialization Time", 0),
            ),
        )
    add("n_tasks", 1)

def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        nexec = int(sys.argv[2])
        with open(sys.argv[3]) as fh:
            a = json.load(fh)
        _leg(nexec, a["tdir"], a["pyzip"], a["evdir"], sys.argv[4])
        return

    import subprocess

    import bench

    tdir = os.environ.get("PROBE_TDIR")
    if not tdir:
        tdir = tempfile.mkdtemp(prefix="probe_t_", dir="/dev/shm")
        print(f"generating inputs in {tdir} ...", flush=True)
        bench._run_sub("--gen", {"tdir": tdir, "cpus": 32, "n_conv": 4000,
                                 "n_conv_scale": 40000})
    pyzip = os.path.join(tdir, "splade_spark_pkg.zip")
    evdir = tempfile.mkdtemp(prefix="probe_ev_")
    results = {}
    rounds = int(os.environ.get("PROBE_ROUNDS", "1"))
    for r in range(rounds):
        for nexec in (2, 8):
            bench._settle()
            fd, ap = tempfile.mkstemp(suffix=".json")
            os.close(fd)
            op = ap + ".out"
            with open(ap, "w") as fh:
                json.dump({"tdir": tdir, "pyzip": pyzip, "evdir": evdir}, fh)
            t0 = time.time()
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg",
                 str(nexec), ap, op],
                check=True,
            )
            with open(op) as fh:
                res = json.load(fh)
            res["leg_wall"] = round(time.time() - t0, 1)
            ev = os.path.join(evdir, res["app_id"])
            res["metrics"] = _parse_evlog(ev)
            results[f"{nexec}x_r{r}"] = res
            print(json.dumps({f"{nexec}x_r{r}": res}, indent=1), flush=True)
    with open("/tmp/probe_results.json", "w") as fh:
        json.dump({"tdir": tdir, "results": results}, fh, indent=1)
    print("tdir (reusable via PROBE_TDIR):", tdir)


if __name__ == "__main__":
    main()
