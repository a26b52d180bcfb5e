"""Measure the dev box's probe ratio to anchor calibrate.REF_PROBE_RATIO
(run once per hardware generation; prints the measured legs + ratio)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from elasticsearch_alps_spark.queries import calibrate

if __name__ == "__main__":
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.ui.enabled", "false").getOrCreate())
    py = calibrate.python_decode_ns_per_posting()
    jvm = calibrate.jvm_scan_ns_per_row(spark)
    print(f"python_decode_ns_per_posting = {py:.3f}")
    print(f"jvm_scan_ns_per_row          = {jvm:.3f}")
    print(f"probe_ratio                  = {py / jvm:.4f}")
    spark.stop()
