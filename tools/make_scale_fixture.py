"""Build the 50k-doc hot-bucket certification fixture.

The driver's oracle gate runs at 500-5,000 docs, where LSH buckets are
thin and the hot-bucket cap / salted-edge paths never actually bind.
This fixture makes them bind: N organic synthetic docs (the same seeded
generator as the bench pages corpus) plus a TEMPLATE FLOOD — F docs
cycling 8 near-identical boilerplate templates with one-token variants —
so capped/salted dedup profiles are certified at a scale where the
approximation semantics genuinely engage (template buckets hold
hundreds of members, far past max_bucket / salt widths).

Writes <dest>/documents.parquet (doc_id, text, lang, source, n_chars);
the other oracle tables are copied from the source sf dir so
tools/check_queries.py can register all its views.

Usage:
    python tools/make_scale_fixture.py [dest] [n_organic] [n_flood]
    CHECK_QUERIES_JSON=CORRECTNESS_scale50k.json \
        python tools/check_queries.py <dest> simhash_capped_near_pairs ...
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC_SF = "/root/testdata/sf0.1"

TEMPLATES = [
    "accept all cookies to continue reading this site uses cookies to "
    "improve your experience and deliver personalised advertising",
    "copyright all rights reserved terms of service privacy policy "
    "contact us about careers press sitemap newsletter subscribe",
    "sign in to your account email address password forgot password "
    "remember me create free account continue with social login",
    "breaking news latest headlines top stories world politics business "
    "technology sports entertainment weather traffic local updates",
    "add to cart free shipping on orders over fifty in stock ships "
    "within two business days easy returns secure checkout guarantee",
    "comments are closed for this article share this story on social "
    "media related articles recommended for you trending now popular",
    "404 page not found the page you requested could not be located "
    "return to homepage search our archive browse categories help",
    "download our mobile app available on all platforms rate this page "
    "was this article helpful yes no send feedback to the editors",
]

VARIANT_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]


def main() -> int:
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/rpv2_scale50k")
    n_organic = int(sys.argv[2]) if len(sys.argv) > 2 else 45_000
    n_flood = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from redpajama_v2_processing_spark.fixtures import generate_pages_pdf

    dest.mkdir(parents=True, exist_ok=True)
    pdf = generate_pages_pdf(n_organic, seed=7)
    hosts = pdf["url"].str.split("/").str[2]
    rows = {
        "doc_id": list(range(n_organic)),
        "text": list(pdf["text"]),
        "lang": list(pdf["lang"]),
        "source": list(hosts),
    }
    # template flood: ids far above both the organic range and the
    # +1e6 offsets some queries use for their own synthetic twins
    for i in range(n_flood):
        rows["doc_id"].append(10_000_000 + i)
        rows["text"].append(
            TEMPLATES[i % len(TEMPLATES)]
            + " " + VARIANT_WORDS[(i // len(TEMPLATES)) % len(VARIANT_WORDS)]
        )
        rows["lang"].append("en")
        rows["source"].append("template-farm.example.com")
    out = pd.DataFrame(rows)
    out["n_chars"] = out["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        dest / "documents.parquet",
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        src = Path(SRC_SF) / f"{t}.parquet"
        if src.exists():
            shutil.copy(src, dest / f"{t}.parquet")

    # scale embeddings table (sf0.1 ships only 2k vectors): 50k vectors,
    # deterministic seeded normals, identical schema to the driver table
    # (vec_id long, embedding list<float>, label int32 in 0..9). The
    # embedding dedup queries plant their own perturbed near-dup twins;
    # this gives the star/PQ families a corpus an order of magnitude past
    # their sf0.1 certification scale.
    import numpy as np

    n_emb = int(sys.argv[4]) if len(sys.argv) > 4 else 50_000
    rng = np.random.default_rng(11)
    emb = rng.normal(size=(n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    etab = pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([row for row in emb.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array((np.arange(n_emb) % 10).astype("int32"),
                          pa.int32()),
    })
    pq.write_table(etab, dest / "embeddings.parquet")
    print(f"wrote {dest}/documents.parquet: {len(out)} docs "
          f"({n_organic} organic + {n_flood} template-flood); "
          f"embeddings.parquet: {n_emb} vectors")
    return 0


if __name__ == "__main__":
    sys.exit(main())
