"""joern_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference CPG platform
(TheGreatAutomata/joern, studied read-only at /root/reference) as
``ray.data.Dataset`` pipelines over multi-turn conversation transcripts:
per-unit parse → mention/triple extraction → entity linking →
canonicalization → node/edge Parquet tables.

Reference lifecycle mapping (see SURVEY.md §3.1):
  joern-parse per-file AstCreationPass  → map_batches turn-level extraction
  overlay passes (Base/CallGraph/...)   → staged Dataset→Dataset functions
  FULL_NAME index + linkToSingle        → hash joins on canonical keys
  DynamicCallLinker candidate sets      → MinHash/LSH candidate blocking
  stub dedup / TypeNodePass set-union   → anti-join + groupby.first
  metaData.overlays resume ledger       → _manifest per-stage lineage
"""

__version__ = "0.1.0"
