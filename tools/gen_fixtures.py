"""Generate the committed ingestion fixtures (fixtures/corpus.tsv,
fixtures/corpus.jsonl) from the deterministic synthetic corpus.

Run once and commit the outputs; both the Spark ingestion path
(`sources.delimited`) and its DuckDB oracle read these exact files.
"""

from __future__ import annotations

import json
import os

from colbert_spark.sources.synth import synth_web_pages

N_ROWS = 60
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    pdf = synth_web_pages(N_ROWS)
    # TSV: (pid, title, text) — the reference's passage-collection layout.
    # Texts contain no tabs/newlines by construction (synth vocab + spaces).
    with open(os.path.join(OUT_DIR, "corpus.tsv"), "w", encoding="utf8") as f:
        for i, row in pdf.iterrows():
            f.write(f"{i}\ttitle {i}\t{row['text']}\n")
    with open(os.path.join(OUT_DIR, "corpus.jsonl"), "w", encoding="utf8") as f:
        for _, row in pdf.iterrows():
            f.write(
                json.dumps(
                    {"url": row["url"], "text": row["text"], "lang": row["lang"]},
                    ensure_ascii=False,
                )
                + "\n"
            )
    print(f"wrote {N_ROWS}-row fixtures to {os.path.abspath(OUT_DIR)}")


if __name__ == "__main__":
    main()
