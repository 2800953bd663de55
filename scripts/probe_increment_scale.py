"""Ad-hoc scale probe: incremental dedup of a 20k-doc crawl increment
against a 200k-doc corpus index (same Zipf-template generator family as
the round-2 clean_corpus probe). Records wall for (a) one-time index
build + write, (b) per-increment indexed join + keep-set."""
import time, sys
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
from pyspark.sql import SparkSession, functions as F
from hll_spark.operators.dedup import minhash_index, dedup_increment_index

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def corpus_df(n, id_start, seed_tag):
    # Zipf-ish template mixture: 30% of docs share 200 templates
    # (boilerplate clusters), 70% unique filler — same family as the
    # round-2 probe, deterministic via md5 arithmetic
    ids = spark.range(id_start, id_start + n).withColumnRenamed("id", "doc_id")
    h = F.conv(F.substring(F.md5(F.concat(F.lit(seed_tag), F.col("doc_id").cast("string"))), 1, 6), 16, 10).cast("long")
    tpl = (h % 200)
    is_tpl = (h % 10) < 3
    tpl_txt = F.array_join(F.transform(F.sequence(F.lit(1), F.lit(80)), lambda j: F.format_string("t%d_%d", tpl, j)), " ")
    uniq_txt = F.array_join(F.transform(F.sequence(F.lit(1), F.lit(60)), lambda j: F.format_string("u%d_%d", F.col("doc_id"), j)), " ")
    return ids.select("doc_id", F.when(is_tpl, tpl_txt).otherwise(uniq_txt).alias("text"))

corpus = corpus_df(200_000, 0, "corp")
idx_path = "/tmp/probe_increment_idx.parquet"
t0 = time.perf_counter()
minhash_index(corpus, "text", "doc_id").write.mode("overwrite").parquet(idx_path)
t_index = time.perf_counter() - t0

index = spark.read.parquet(idx_path)
# increment: 20k docs — half clones of corpus templates (same seed_tag
# family so ~30% hit the shared templates), half novel
inc = corpus_df(20_000, 1_000_000, "corp")  # same templates => its 30% template docs duplicate corpus
t0 = time.perf_counter()
mode = sys.argv[1] if len(sys.argv) > 1 else "rep"
kept = dedup_increment_index(inc, index, "text", "doc_id", threshold=0.8, verify=mode)
n_kept = kept.count()
t_join = time.perf_counter() - t0
print({"verify": mode, "index_build_s": round(t_index, 1),
       "increment_join_s": round(t_join, 1),
       "corpus": 200_000, "increment": 20_000, "kept": n_kept})
spark.stop()
