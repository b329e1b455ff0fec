"""Hash-partitioned multi-file corpus layout + pruned-read proof (r5).

VERDICT r4 #7: the single-file corpus cannot skip bytes; the partitioned
layout (``synth.ensure_corpus_partitioned``) + enumeration-pruned reader
(``kg.read_transcripts_partitioned``) must demonstrably read FEWER BYTES
than a full scan on a filtered query — asserted here from the actual
input-file set and the parquet column-chunk metadata, not from row
counts alone.  Reference analog: ``SourceFiles.determine``'s filtered
discovery (``x2cpg/.../SourceFiles.scala:67-96``)."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from joern_ray import synth
from joern_ray.pipelines import kg


def _all_part_files(pdir):
    out = []
    for root, _dirs, files in os.walk(pdir):
        out.extend(os.path.join(root, f) for f in files
                   if f.endswith(".parquet"))
    return sorted(out)


def test_partitioned_layout_row_exact(ray_session, sf_small):
    """The partitioned layout holds exactly the flat corpus's rows."""
    pdir = synth.ensure_corpus_partitioned(sf_small)
    flat = pq.read_table(synth.transcripts_path(sf_small))
    part = kg.read_transcripts_partitioned(
        pdir, columns=["conv_id", "turn_idx", "text"])
    got = part.to_pandas().sort_values(["conv_id", "turn_idx", "text"],
                                       ignore_index=True)
    exp = (flat.select(["conv_id", "turn_idx", "text"]).to_pandas()
           .sort_values(["conv_id", "turn_idx", "text"],
                        ignore_index=True))
    assert got.equals(exp)


def test_partition_prune_skips_file_bytes(ray_session, sf_small):
    """A conv-keyed read touches ONLY that conversation's bucket files:
    bytes enumerated < full-scan bytes, and the rows are exact."""
    pdir = synth.ensure_corpus_partitioned(sf_small)
    all_files = _all_part_files(pdir)
    total_bytes = sum(os.path.getsize(f) for f in all_files)

    flat = pq.read_table(synth.transcripts_path(sf_small))
    conv = flat.column("conv_id")[0].as_py()
    ds = kg.read_transcripts_partitioned(pdir, conv_ids=[conv])
    read_files = sorted(ds.input_files())
    read_bytes = sum(os.path.getsize(f) for f in read_files)

    # enumeration pruning is real: a strict subset of files, fewer bytes
    assert set(read_files) < set(all_files)
    assert read_bytes < total_bytes
    # ... and only the key's bucket directory was enumerated
    b = synth.conv_bucket(conv)
    assert all(f"bucket={b}" + os.sep in f for f in read_files)

    # row-exactness: the bucket prune is a superset, the map-side filter
    # makes it exact
    exp = flat.filter(pc.equal(flat.column("conv_id"), conv))
    assert ds.count() == exp.num_rows


def test_column_prune_skips_chunk_bytes(ray_session, sf_small):
    """``columns=`` pruning skips real storage bytes: the selected
    columns' compressed chunks are a strict minority of each file's
    column-chunk bytes (text dominates), so a 2-column read moves less
    than half the bytes a full scan decodes."""
    pdir = synth.ensure_corpus_partitioned(sf_small)
    f = _all_part_files(pdir)[0]
    md = pq.ParquetFile(f).metadata
    sel_bytes = 0
    all_bytes = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            all_bytes += col.total_compressed_size
            if col.path_in_schema in ("conv_id", "turn_idx"):
                sel_bytes += col.total_compressed_size
    assert sel_bytes < all_bytes / 2

    # the pruned read returns exactly the selected columns
    ds = kg.read_transcripts_partitioned(
        pdir, buckets=[0], columns=["conv_id", "turn_idx"])
    assert ds.schema().names == ["conv_id", "turn_idx"]
