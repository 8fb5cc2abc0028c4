"""Operating-point frontiers demo — the decision tables a 100 TB pipeline
operator reads BEFORE committing to a threshold, a banding, an epsilon, an
index width, or a probe budget. Each table comes from ONE evaluation; every
row is an operating point you could ship.

    dedup_threshold_frontier   which Jaccard threshold to dedup at
    minhash_band_frontier      which (bands x rows) LSH config to run
    minhash_size_frontier      how many minhashes to store per doc
    semdedup_eps_frontier      which SemDeDup cosine epsilon to apply
    ann_dims_frontier          which Matryoshka prefix width to index hot
    ann_storage_frontier       which compressed representation to store
    curation_funnel            where the corpus actually goes, per gate

Run: python examples/frontier_demo.py [sf_dir]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsgen.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("frontier-demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    from tsgen import dedup, similarity
    from tsgen.queries import registry

    print("\n== dedup threshold frontier (one PPJoin, every threshold) ==")
    dedup.dedup_threshold_frontier(docs).orderBy("thr_pct").show()

    print("== MinHash banding frontier (one signature, every banding) ==")
    dedup.minhash_band_frontier(docs).orderBy("bands").show()

    print("== MinHash signature-length frontier (estimator accuracy) ==")
    dedup.minhash_size_frontier(docs).orderBy("sig_len").show()

    print("== SemDeDup epsilon frontier (one LSH run, every epsilon) ==")
    similarity.semdedup_eps_frontier(emb).orderBy("eps_pct").show()

    print("== Matryoshka width frontier (one pair pass, every prefix) ==")
    similarity.dims_frontier(emb).orderBy("dims").show()

    print("== ANN storage table (bytes/vec vs recall, all methods) ==")
    similarity.storage_frontier(emb).orderBy("bytes_per_vec").show()

    print("== curation funnel (where the corpus goes, per gate) ==")
    registry()["curation_funnel"].spark_fn(spark, sf_dir).orderBy("stage").show()

    spark.stop()


if __name__ == "__main__":
    main()
