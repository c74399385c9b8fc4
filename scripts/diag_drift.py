"""Diagnose position-dependent bench drift: run HEADLINE in order,
probe q1_pricing_summary every 10 queries, snapshot JVM/file state."""
import glob, os, sys, time
sys.path.insert(0, "/root/repo")
from distributed_mapreduce_server_spark import get_spark, registry
from bench import HEADLINE

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("dmrs-diag")
spark.sparkContext.setLogLevel("ERROR")
queries = registry.all_queries()
names = [n for n in HEADLINE if n in queries]

jvm = spark.sparkContext._jvm
rt = jvm.java.lang.Runtime.getRuntime()

def local_dirs():
    # spark local dir block/shuffle file count
    base = spark.sparkContext._jsc.sc().env().blockManager().diskBlockManager().localDirsString()
    n = 0
    for d in base:
        for root, dirs, files in os.walk(d):
            n += len(files)
    return n

def probe():
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    queries["q1_pricing_summary"](spark, sf_dir).count()
    dt = time.perf_counter() - t0
    heap = (rt.totalMemory() - rt.freeMemory()) / 1e9
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())
    loaded = mf.getClassLoadingMXBean().getLoadedClassCount()
    nthreads = mf.getThreadMXBean().getThreadCount()
    return dt, heap, gc_ms, loaded, nthreads, local_dirs()

# warm codegen for probe
queries["q1_pricing_summary"](spark, sf_dir).count()
print(f"{'pos':>4} {'probe_s':>8} {'heap_GB':>8} {'gc_ms':>8} {'classes':>8} {'thr':>5} {'files':>7}", flush=True)
dt, heap, gc, cls, thr, nf = probe()
print(f"{0:>4} {dt:8.3f} {heap:8.2f} {gc:8d} {cls:8d} {thr:5d} {nf:7d}", flush=True)
for i, name in enumerate(names, 1):
    spark.catalog.clearCache()
    queries[name](spark, sf_dir).count()
    if i % 10 == 0 or i == len(names):
        dt, heap, gc, cls, thr, nf = probe()
        print(f"{i:>4} {dt:8.3f} {heap:8.2f} {gc:8d} {cls:8d} {thr:5d} {nf:7d}  after {name}", flush=True)
