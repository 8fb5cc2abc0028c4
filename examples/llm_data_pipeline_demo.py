"""End-to-end LLM training-data pipeline tour — the round-5 operator set
composed in the order a real corpus build runs them:

    docs    -> exact substring dedup (Lee et al. 2022 stride-1 L-grams;
               hash-keyed twin = the 8-byte-shuffle cluster plan)
            -> first-fit-decreasing sequence packing (whole-doc bins)
            -> temperature language mixing (XLM/mT5 p^alpha rule)
            -> BPE: train merges, then encode the corpus (tokens/doc)
            -> BM25 retrieval eval with graded nDCG@k
    vectors -> Matryoshka truncation recall@k (16 of 64 dims as the
               cheap ANN prefilter: go/no-go)
    series  -> Hyndman ts feature vector + Bates-Granger forecast combo +
               Syntetos-Boylan demand classes (SKU -> forecaster routing)

Run: python examples/llm_data_pipeline_demo.py [sf_dir]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsgen.queries import registry
from tsgen.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("llm-pipeline-demo")
    reg = registry()
    tour = [
        ("exact substring dedup (per-doc duplicated spans)", "dedup_substr"),
        ("same, hash-keyed shuffle (the cluster plan)", "dedup_substr_hash"),
        ("first-fit-decreasing packing (whole-doc bins)", "pack_sequences_ffd"),
        ("temperature language mixing p^0.3", "doc_lang_temperature"),
        ("BPE merge training (8 iterations)", "bpe_train"),
        ("BPE encode: tokens per doc", "bpe_encode"),
        ("BM25 graded nDCG@k retrieval eval", "doc_bm25_ndcg"),
        ("Matryoshka dim-truncation recall@k", "embed_trunc_recall"),
        ("Hyndman ts feature vector", "ts_features"),
        ("Bates-Granger forecast combination", "forecast_combo"),
        ("Syntetos-Boylan demand classes", "li_demand_classes"),
        ("harmonic centrality over the near-dup graph", "graph_closeness"),
        # round-12: the multimodal corpus ingest path — REAL codec-free
        # decoders (stdlib zlib / struct), narrow MapInPandas
        ("real PNG decode -> channel stats", "multimodal_decode_png"),
        ("real WAV decode -> exact clip stats", "multimodal_decode_wav"),
        ("real Y4M decode -> per-frame stats (1->N)", "multimodal_decode_y4m"),
        # round-13: baseline JPEG (canonical Huffman + DCT), DoReMi-lite
        # mixture reweighting, and cross-codec content-addressed dedup
        ("real baseline-JPEG decode -> pixel stats", "multimodal_decode_jpeg"),
        ("JPEG AC path: dequantized-coefficient stats", "multimodal_decode_jpeg_ac"),
        ("DoReMi-lite domain reweighting", "mix_doremi"),
        ("cross-codec dedup (PNG+JPEG agree on pixels)", "media_cross_codec_dedup"),
    ]
    for title, name in tour:
        print(f"\n=== {title} ({name}) ===")
        df = reg[name].spark_fn(spark, sf_dir)
        df.show(8, truncate=False)


if __name__ == "__main__":
    main()
