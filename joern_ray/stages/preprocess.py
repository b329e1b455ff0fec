"""Input preprocessing pass — the ``PreprocessorPass`` analog
(c2cpg's preprocessor normalizes the token stream before the real parse;
here: normalize dirty transcript text before extraction).

Opt-in stage (the default pipeline consumes raw text so oracle parity is
byte-exact); wired ahead of ``extract_triples`` when ingesting raw dumps:

    tds = preprocess(read_transcripts_jsonl(path))

All kernels are vectorized RE2/Arrow; the pass is idempotent
(pytest-asserted) so re-running a resumed pipeline cannot double-apply it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# control characters (except \t) → space; then any whitespace run → one
# space; then ASCII-trim.  RE2 classes only.
_CTRL_RE = r"[\x00-\x08\x0b-\x1f\x7f]"
_WS_RUN_RE = r"[ \t\n\f\r]+"


def clean_text_batch(t: pa.Table) -> pa.Table:
    text = t.column("text")
    cleaned = pc.replace_substring_regex(text, _CTRL_RE, " ")
    cleaned = pc.replace_substring_regex(cleaned, _WS_RUN_RE, " ")
    cleaned = pc.utf8_trim(cleaned, " ")
    return t.set_column(t.schema.get_field_index("text"), "text", cleaned)


def preprocess(transcripts_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return transcripts_ds.map_batches(clean_text_batch,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
