"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in joern_ray) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``        — flagship KG pipeline on the sf0.001 synthetic corpus.
- ``queries()``      — one entry per implemented operator/pipeline
                       (SURVEY.md §2 + training-data ops).
- ``oracle_sql()``   — DuckDB-equivalent SQL for the SQL-expressible subset;
                       transcript-based oracles read the deterministic
                       synthetic corpus parquet (generated idempotently,
                       same bytes every run — see joern_ray/synth.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _transcripts(sf_dir: str):
    import ray.data
    from joern_ray import synth
    return ray.data.read_parquet(synth.transcripts_path(sf_dir))


_BUILD_CACHE: dict[str, dict] = {}


def _graph(sf_dir: str) -> dict:
    """Memoized flagship build per sf_dir: the heavy stages inside
    build_graph are materialized Datasets, safely re-consumable by every
    query that needs a piece of the graph — rebuilding the whole chain per
    query would only re-measure the same work."""
    if sf_dir not in _BUILD_CACHE:
        from joern_ray.pipelines import kg
        _BUILD_CACHE[sf_dir] = kg.build_graph(_transcripts(sf_dir))
    return _BUILD_CACHE[sf_dir]


def _oracle_transcripts_path() -> str:
    from joern_ray import synth
    return synth.transcripts_path(SF_ORACLE)


def _kind_recovery_sql(transcripts_rel: str) -> str:
    from joern_ray.stages import kindrec as KR
    return KR.kind_recovery_sql(transcripts_rel)


def _surface_triples_sql(transcripts_rel: str) -> str:
    """Surface (unresolved) triples = the Stage-A events restricted to
    etype='triple' — delegated to the shared sqlgen so exclusion precedence
    (pronoun-template suppression, not a broad prefix test) has one source
    of truth."""
    from joern_ray.extract import sqlgen as G
    return ("SELECT conv_id, turn_idx, subj, pred, obj FROM "
            f"({G.events_sql(transcripts_rel)}) WHERE etype = 'triple'")


# ---------------------------------------------------------------------------
# driver surface
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on sf0.001: transcripts → canonical triples."""
    from joern_ray.pipelines import kg
    res = kg.build_graph(_transcripts(SF_SMALL))
    return res["triples_canonical"]


def queries() -> dict[str, Callable[[str], Any]]:
    from joern_ray.pipelines import ann as A
    from joern_ray.pipelines import events as EV
    from joern_ray.pipelines import findings as FND
    from joern_ray.pipelines import incremental as INC
    from joern_ray.pipelines import kg
    from joern_ray.pipelines import relational as REL
    from joern_ray.pipelines import text as T
    from joern_ray.stages import chains as CH
    from joern_ray.stages import extract as X
    from joern_ray.stages import graphstats as GS
    from joern_ray.stages import kindrec as KR
    from joern_ray.stages import multimodal as MM
    from joern_ray.stages import reach as RCH

    import pyarrow.compute as pc

    # -- knowledge-graph construction -----------------------------------
    def kg_turns(sf_dir):
        import pyarrow as pa
        ds = _transcripts(sf_dir)
        return ds.map_batches(
            lambda t: t.select(["conv_id", "turn_idx", "role", "text"]),
            batch_format="pyarrow")

    def kg_triples_surface(sf_dir):
        ds = _transcripts(sf_dir)
        ev = ds.map_batches(X.extract_events, batch_format="pyarrow",
                            zero_copy_batch=True)
        return ev.map_batches(
            lambda t: X._passthrough_triples(t)
                       .select(["conv_id", "turn_idx", "subj", "pred", "obj"]),
            batch_format="pyarrow")

    def kg_triples_surface_exttool(sf_dir):
        """Surface triples via the EXTERNAL-TOOL actor pool (per-actor
        subprocess + JSONL pipe — the AstGenRunner subprocess analog,
        ``AstGenRunner.scala:120-210``); verified against the same SQL
        oracle as the in-process kernel."""
        from joern_ray.stages.external_tool import extract_events_external
        ev = extract_events_external(_transcripts(sf_dir))
        return ev.map_batches(
            lambda t: X._passthrough_triples(t)
                       .select(["conv_id", "turn_idx", "subj", "pred", "obj"]),
            batch_format="pyarrow")

    def kg_triples_resolved(sf_dir):
        return X.extract_triples(_transcripts(sf_dir)).map_batches(
            lambda t: t.select(["conv_id", "turn_idx", "subj", "pred", "obj"]),
            batch_format="pyarrow")

    def kg_triples_attributed(sf_dir):
        """Resolved triples WITH relation attributes (sent_idx / negated /
        in_question / is_past / aspect / since_year / hedged — the v24
        tense, v27 aspect, v33 temporal-adjunct and v36 hedge
        attributes) — the DependencyJsonGenerator attributed-relation
        analog (``DependencyJsonGenerator.scala:278-292``)."""
        return X.extract_triples(_transcripts(sf_dir)).map_batches(
            lambda t: t.select(["conv_id", "turn_idx", "sent_idx", "subj",
                                "pred", "obj", "negated", "in_question",
                                "is_past", "aspect", "since_year",
                                "hedged", "slot_idx", "clause"]),
            batch_format="pyarrow")

    def kg_triples_definite(sf_dir):
        """Cross-sentence definite-description anaphora (v12-v15): 'The
        maintainer of <mod> met with <Y>.' — plain, org/tool-object,
        quoted-nested AND object-side ('Bob met with the maintainer of
        <mod>.') variants — resolved against module-keyed committed
        maintainer state (the cross-AST linking analog); the clause
        column ('definite' / 'quoted_definite' / 'definite_obj')
        distinguishes the construct."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from joern_ray.functions import rules as R
        vs = pa.array([R.DESC_CLAUSE, R.DESC_QUOTED_CLAUSE,
                       R.DESC_OBJ_CLAUSE, R.DESC_ORG_CLAUSE])
        return X.extract_triples(_transcripts(sf_dir)).map_batches(
            lambda t: t.filter(pc.is_in(t.column("clause"), value_set=vs))
                       .select(["conv_id", "turn_idx", "subj", "pred",
                                "obj", "clause"]),
            batch_format="pyarrow")

    def kg_triples_plural(sf_dir):
        """Plural-pronoun anaphora (v32): "They ..." expands to one
        triple per DISTINCT member of the anchor turn's committed person
        set — slot_idx = lexicographic rank, clause 'plural' (the
        variable-fan-out resolution construct; aspect rides the plural
        auxiliaries)."""
        import pyarrow.compute as pc
        return X.extract_triples(_transcripts(sf_dir)).map_batches(
            lambda t: t.filter(pc.equal(t.column("clause"), "plural"))
                       .select(["conv_id", "turn_idx", "subj", "pred",
                                "obj", "slot_idx", "aspect"]),
            batch_format="pyarrow")

    def kg_triples_plural_recip(sf_dir):
        """Plural-reciprocal anaphora (v34): "They met." expands to one
        triple per ORDERED PAIR of distinct members of the anchor
        turn's committed person set (k members => k*(k-1) rows,
        slot_idx = the subject's lexicographic rank, clause
        'plural_recip') — the quadratic fan-out construct; aspect rides
        the plural auxiliaries."""
        import pyarrow.compute as pc
        return X.extract_triples(_transcripts(sf_dir)).map_batches(
            lambda t: t.filter(pc.equal(t.column("clause"),
                                        "plural_recip"))
                       .select(["conv_id", "turn_idx", "subj", "pred",
                                "obj", "slot_idx", "aspect"]),
            batch_format="pyarrow")

    def kg_triples_org_pronoun(sf_dir):
        """Org-pronoun anaphora (v38): "It acquired X." resolves the
        subject to the committed org surface of the latest
        strictly-earlier turn (object shadows subject; turn max;
        resolved rows feed no state so "It" chains co-refer) — the
        engine's first NON-PERSON referent stream, riding the generic
        descriptor machinery under the reserved rules.ORG_REF_KEY."""
        import pyarrow.compute as pc
        return X.extract_triples(_transcripts(sf_dir)).map_batches(
            lambda t: t.filter(pc.equal(t.column("clause"),
                                        "org_pronoun"))
                       .select(["conv_id", "turn_idx", "subj", "pred",
                                "obj", "subj_kind", "aspect",
                                "since_year"]),
            batch_format="pyarrow")

    def kg_list_coordination(sf_dir):
        """Open-ended coordination lists (v12): members at slot_idx >= 3
        exist ONLY in 4+-way lists (the list-capture split path)."""
        import pyarrow.compute as pc
        return X.extract_triples(_transcripts(sf_dir)).map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("slot_idx"), 3))
                       .select(["conv_id", "turn_idx", "subj", "pred",
                                "obj", "slot_idx"]),
            batch_format="pyarrow")

    def kg_next_turn_edges(sf_dir):
        from joern_ray.stages import materialize as M
        return _transcripts(sf_dir).map_batches(
            M.next_turn_edges, batch_format="pyarrow").map_batches(
            lambda t: t.select(["src", "dst", "conv_id", "turn_idx"]),
            batch_format="pyarrow")

    def kg_triples_canonical(sf_dir):
        return _graph(sf_dir)["triples_canonical"]

    def kg_entities(sf_dir):
        return _graph(sf_dir)["entities"].map_batches(
            lambda t: t.select(["kind", "norm", "canonical", "entity_id"])
            if t.num_columns else t,
            batch_format="pyarrow")

    def kg_entities_exact(sf_dir):
        from joern_ray.functions import rules as R
        ents = _graph(sf_dir)["entities"]
        import pyarrow as pa
        ex_arr = pa.array(sorted(R.FUZZY_KINDS | R.NONLINK_KINDS))
        return ents.map_batches(
            lambda t: (t.filter(pc.invert(pc.is_in(t.column("kind"),
                                                   value_set=ex_arr)))
                       .select(["kind", "norm", "canonical"]))
            if t.num_columns else t,
            batch_format="pyarrow")

    def kg_nodes(sf_dir):
        return _graph(sf_dir)["nodes"]

    def kg_edges(sf_dir):
        return _graph(sf_dir)["edges"]

    def kg_export_dot(sf_dir):
        from joern_ray.stages.export import dot_per_conversation
        return dot_per_conversation(_graph(sf_dir)["edges"])

    def kg_conv_json(sf_dir):
        from joern_ray.stages.export import conv_triples_json
        return conv_triples_json(_graph(sf_dir)["triples_canonical"])

    def kg_dominators(sf_dir):
        from joern_ray.stages import dom as D
        from joern_ray.stages import materialize as M
        edges = _transcripts(sf_dir).map_batches(
            M.next_turn_edges, batch_format="pyarrow")
        return D.dominators(edges)

    def kg_post_dominators(sf_dir):
        from joern_ray.stages import dom as D
        from joern_ray.stages import materialize as M
        edges = _transcripts(sf_dir).map_batches(
            M.next_turn_edges, batch_format="pyarrow")
        return D.post_dominators(edges)

    def kg_cdg(sf_dir):
        """Control-dependence edges (Ferrante via post-dominators) over the
        NEXT_TURN chain augmented with deterministic skip-edge diamonds
        (``materialize.skip_edges``) so the CDG is non-vacuous — on a pure
        linear chain it is empty by construction."""
        from joern_ray.stages import dom as D
        from joern_ray.stages import materialize as M
        tds = _transcripts(sf_dir)
        edges = tds.map_batches(
            M.next_turn_edges, batch_format="pyarrow").union(
            tds.map_batches(M.skip_edges, batch_format="pyarrow"))
        return D.control_dependence(edges)

    def kg_export_graphml(sf_dir):
        from joern_ray.stages.export import graphml_per_conversation
        return graphml_per_conversation(_graph(sf_dir)["edges"])

    def kg_export_graphson(sf_dir):
        from joern_ray.stages.export import graphson_per_conversation
        return graphson_per_conversation(_graph(sf_dir)["edges"])

    def _pagerank_query(sf_dir):
        from joern_ray.stages.pagerank import pagerank_query
        return pagerank_query(sf_dir)

    def kg_tool_imports(sf_dir):
        from joern_ray.stages import imports as IMP
        return IMP.import_refs(_transcripts(sf_dir))

    def kg_tool_registry(sf_dir):
        from joern_ray.stages import imports as IMP
        return IMP.tool_registry(_transcripts(sf_dir))

    # -- multimodal (real pure-numpy PPM/WAV/JRV1 decode) ----------------
    def multimodal_features(sf_dir):
        return MM.media_features(sf_dir)

    # Ordering contract: the round driver verifies the FIRST 50 dict
    # entries — every oracle-backed query (oracle_sql() key) comes first,
    # then the rows-only entries that have never had a driver row, then
    # the rows-only entries already pytest-/equivalence-covered.
    return {
        # ---- oracle-backed (kept inside the driver's 50-entry window) ----
        # KG construction (SURVEY.md §2.2/2.4/2.6)
        "kg_triples_surface": kg_triples_surface,
        "kg_triples_resolved": kg_triples_resolved,
        "kg_triples_attributed": kg_triples_attributed,
        # v12 constructs: definite-description anaphora + 4+-way lists
        "kg_triples_definite": kg_triples_definite,
        "kg_list_coordination": kg_list_coordination,
        # r5 third-wave rotation: the v32 plural-pronoun construct gains
        # a dedicated oracle-backed row (set expansion, lexicographic
        # slot ranks, aspect composition) — takes the slot of
        # rel_price_quantiles (driver-confirmed r3 AND r4 with unchanged
        # code, demoted below)
        "kg_triples_plural": kg_triples_plural,
        # r5 fourth-wave rotation: the v34 plural-reciprocal construct
        # (ordered-pair set expansion — the quadratic fan-out) gains an
        # oracle-backed row; takes the slot of conv_line_dedup
        # (driver-confirmed r3 AND r4 with unchanged code, demoted below)
        "kg_triples_plural_recip": kg_triples_plural_recip,
        # r5 fifth-wave rotation: the v38 org-pronoun construct (the
        # first non-person referent stream) gains an oracle-backed row;
        # takes the slot of rel_running_order_total (driver-confirmed
        # r1-r3 AND r4 with unchanged code, demoted below)
        "kg_triples_org_pronoun": kg_triples_org_pronoun,
        # r4 window rotation: text_top_tokens (corpus heavy-hitters, new
        # this round, never driver-confirmed) takes the slot of
        # kg_dominators (driver-confirmed r2 AND r3, code unchanged)
        "text_top_tokens": T.top_tokens,
        "kg_cdg": kg_cdg,
        "kg_entities_exact": kg_entities_exact,
        # conversation-local enrichment (use-chain analog)
        "kg_mention_chains": CH.mention_chains_query,
        # frontier-BFS reachability (reachableBy analog) + slice
        "kg_reachable": RCH.reachable_query,
        "kg_paths": RCH.paths_query,
        "kg_slice": RCH.slice_query,
        # import-resolver + config side-table analogs
        "kg_tool_imports": kg_tool_imports,
        "kg_tool_registry": kg_tool_registry,
        # bounded-iteration kind recovery (XTypeRecovery analog, new r4)
        "kg_kind_recovery": KR.kind_recovery_query,
        # graph-shape metrics (querydb Metrics analog, new r4): per-entity
        # triangle counts + integer-milli local clustering coefficient
        "kg_triangles": GS.triangles_query,
        # scan battery + snippet retrieval + mention aggregation
        # (findings reuses the memoized graph build — ScanPass runs over
        # the already-built CPG, not a fresh extraction)
        "kg_findings": lambda sf: FND.findings(sf, graph=_graph(sf)),
        "kg_snippets": FND.snippets,
        "kg_mention_counts": FND.entity_mention_counts,
        "kg_conv_tools": FND.conv_tools,
        # relational layer (SURVEY.md §2.4/2.5/2.7/2.8)
        "rel_order_gaps": REL.order_gaps,
        # text analysis + dedup (training-data ops)
        "text_quality": T.text_quality,
        "dedup_snapshot": T.snapshot_dedup,
        "text_sample_stratified": T.sample_stratified,
        "text_sample_weighted": T.sample_weighted,
        "text_repetition": T.repetition_stats,
        "text_familiarity": T.familiarity,
        "text_bigram_lm": T.bigram_lm,
        "text_dsir_weights": T.dsir_weights,
        "text_dup_spans": T.dup_spans,
        "text_decontaminate": T.decontaminate,
        "text_decontaminate_ngram": T.decontaminate_ngram,
        "text_tfidf_topk": T.tfidf_topk,
        "text_source_mix_weights": T.source_mix_weights,
        "text_source_overlap": T.source_overlap,
        # event-stream ops (sessionize / window / as-of / funnel /
        # retention — funnel + retention new r4)
        "events_funnel": EV.funnel,
        "events_retention": EV.retention,
        "events_daily_anomaly": EV.daily_anomaly,
        # similarity search + embedding-space decontamination
        "ann_topk": A.ann_bruteforce,
        "embedding_neardup": A.embedding_neardup_planted,
        "embedding_decontaminate": A.embedding_decontaminate,
        "dedup_semantic_planted": A.dedup_semantic_planted,
        # r5 window rotation: three NEWLY-oracle-backed, never-driver-
        # confirmed operators take the slots of dedup_exact /
        # events_sliding_counts / text_token_bins (each driver-confirmed
        # r3 AND r4 with unchanged code) — kg_kcore gains a recursive
        # h-index SQL mirror, dedup_ngram_pairs an exact all-pairs
        # n-gram-Jaccard mirror, text_bpe_token_counts a chained-replace
        # SQL APPLY of the shared trained merges
        "kg_kcore": GS.kcore_query,
        "dedup_ngram_pairs": T.ngram_jaccard_pairs,
        "text_bpe_token_counts": T.bpe_token_counts,
        # r5 rotation (2nd wave): the planted-corpus SimHash family gains
        # integer-exact SQL oracles (embedded 256-token blake2b
        # dictionary + xorshift token arithmetic; the cluster oracle is
        # all-pairs hamming, independently verifying the banding recall
        # AND the verify kernel) — they take the slots of
        # text_clean_corpus / text_redact_persons (driver-confirmed r3
        # AND r4 with unchanged code, demoted below)
        "dedup_simhash_planted": T.dedup_simhash_planted,
        "dedup_simhash_clusters_planted": T.dedup_simhash_clusters_planted,
        # ---- oracle-backed but OUTSIDE the driver's 50-entry window
        # (every window slot is already oracle-backed); all are
        # multiply-driver-confirmed in r1-r3 with unchanged code —
        # kg_turns is a trivial projection, kg_triples_surface_exttool
        # shares kg_triples_surface's oracle, rel_distinct_part_types is
        # a 6-row distinct, text_lang_id / text_fingerprint / text_stats
        # / text_token_counts are pure per-row kernels, rel_topk_orders /
        # rel_orders_by_segment are small stable aggregations — demoted
        # across r4 rotations to admit the round's NEW oracle-backed
        # operators (text_repetition/familiarity/decontaminate,
        # kg_kind_recovery, kg_triples_definite, kg_list_coordination,
        # text_decontaminate_ngram, dedup_semantic_planted,
        # text_tfidf_topk, text_source_mix_weights, events_funnel,
        # events_retention — the last two displacing rel_q1_pricing /
        # rel_events_by_user, driver-confirmed r1-r3 with unchanged
        # code); all demoted entries stay verified by the local
        # dtype-strict gate (scripts/check_correctness.py) ----
        "kg_turns": kg_turns,
        "rel_price_quantiles": REL.price_quantiles_by_segment,
        # r5 fifth-wave demotion (slot given to kg_triples_org_pronoun)
        "rel_running_order_total": REL.running_order_total,
        "conv_line_dedup": (lambda sf_dir: T.line_dedup(_transcripts(sf_dir))),
        "dedup_exact": T.dedup_exact,
        "events_sliding_counts": EV.sliding_window_counts,
        "text_token_bins": T.token_bins,
        "text_clean_corpus": T.clean_corpus,
        "text_redact_persons": T.redact_persons,
        "kg_triples_surface_exttool": kg_triples_surface_exttool,
        "kg_next_turn_edges": kg_next_turn_edges,
        "kg_post_dominators": kg_post_dominators,
        "rel_q1_pricing": REL.q1_pricing,
        "rel_events_by_user": REL.events_by_user,
        "events_window_counts": EV.window_counts,
        "events_sessionize": EV.sessionize,
        "kg_cooccurrence": CH.cooccurrence_query,
        "rel_topk_per_customer": REL.topk_orders_per_customer,
        "events_props_k_stats": EV.props_k_stats,
        "rel_revenue_by_nation": REL.revenue_by_nation,
        "text_lang_id": T.lang_id,
        "text_fingerprint": T.doc_fingerprint,
        "text_stats": T.text_stats,
        "text_token_counts": T.token_counts,
        "rel_distinct_part_types": REL.distinct_part_types,
        "rel_filter_project_parts": REL.filter_project_parts,
        "rel_suppliers_with_shipments": REL.suppliers_with_shipments,
        "rel_customers_without_orders": REL.customers_without_orders,
        "events_asof_prior_view": EV.asof_prior_view,
        "rel_topk_orders": REL.topk_orders,
        "rel_orders_by_segment": REL.orders_by_segment,
        "kg_dominators": kg_dominators,
        # ---- rows-only, no driver row yet (next in the window) ----
        "ann_lsh": A.ann_lsh,
        "dedup_semantic": A.dedup_semantic,
        "ann_ivf": A.ann_ivf,
        "ann_pq": A.ann_pq,
        "embedding_pca": A.embedding_pca,
        "ann_kmeans": A.kmeans,
        "dedup_simhash_clusters": T.simhash_clusters,
        # incremental append (frozen-directory continuous-crawl overlay;
        # full-vs-incremental equivalence pytest-asserted both ways)
        "kg_build_incremental": INC.incremental_check_query,
        "multimodal_features": multimodal_features,
        "multimodal_resized_features": MM.resized_features,
        "multimodal_sampled_frames": MM.sampled_frames,
        # ---- rows-only, pytest-/equivalence-covered (tail) ----
        "kg_triples_canonical": kg_triples_canonical,
        "kg_entities": kg_entities,
        "kg_nodes": kg_nodes,
        "kg_edges": kg_edges,
        "kg_export_dot": kg_export_dot,
        "kg_export_graphml": kg_export_graphml,
        "kg_export_graphson": kg_export_graphson,
        "kg_conv_json": kg_conv_json,
        "kg_pagerank": (lambda sf_dir: _pagerank_query(sf_dir)),
        "text_vectors_hashed": T.hashed_vectors,
        "text_model_scores": T.model_scores,
        "text_quality_classifier": T.quality_classifier_scores,
        "dedup_minhash": T.dedup_minhash,
        "dedup_simhash": T.dedup_simhash,
    }


def oracle_sql() -> dict[str, str]:
    from joern_ray.pipelines import ann as A
    from joern_ray.pipelines import events as EV
    from joern_ray.pipelines import findings as FND
    from joern_ray.pipelines import relational as REL
    from joern_ray.pipelines import text as T
    from joern_ray.stages import chains as CH
    from joern_ray.stages import graphstats as GS
    from joern_ray.stages import reach as RCH

    from joern_ray.extract import sqlgen as G

    tp = _oracle_transcripts_path()  # idempotent deterministic generation
    tr = f"read_parquet('{tp}')"

    return {
        "kg_turns": f"SELECT conv_id, turn_idx, role, text FROM {tr}",
        "kg_triples_surface": _surface_triples_sql(tr),
        "kg_triples_surface_exttool": _surface_triples_sql(tr),
        "kg_triples_resolved": ("SELECT conv_id, turn_idx, subj, pred, obj "
                                f"FROM ({G.resolved_triples_sql(tr)})"),
        "kg_triples_attributed": (
            "SELECT conv_id, turn_idx, sent_idx, subj, pred, obj, "
            "negated, in_question, is_past, aspect, since_year, "
            "hedged, slot_idx, clause "
            f"FROM ({G.resolved_triples_sql(tr)})"),
        "kg_triples_definite": (
            "SELECT conv_id, turn_idx, subj, pred, obj, clause "
            f"FROM ({G.resolved_triples_sql(tr)}) "
            "WHERE clause IN ('definite', 'quoted_definite', "
            "'definite_obj', 'definite_org')"),
        "kg_list_coordination": (
            "SELECT conv_id, turn_idx, subj, pred, obj, slot_idx "
            f"FROM ({G.resolved_triples_sql(tr)}) "
            "WHERE slot_idx >= 3"),
        "kg_triples_plural": (
            "SELECT conv_id, turn_idx, subj, pred, obj, slot_idx, aspect "
            f"FROM ({G.resolved_triples_sql(tr)}) "
            "WHERE clause = 'plural'"),
        "kg_triples_plural_recip": (
            "SELECT conv_id, turn_idx, subj, pred, obj, slot_idx, aspect "
            f"FROM ({G.resolved_triples_sql(tr)}) "
            "WHERE clause = 'plural_recip'"),
        "kg_triples_org_pronoun": (
            "SELECT conv_id, turn_idx, subj, pred, obj, subj_kind, "
            "aspect, since_year "
            f"FROM ({G.resolved_triples_sql(tr)}) "
            "WHERE clause = 'org_pronoun'"),
        "kg_findings": FND.findings_sql(tr),
        "kg_snippets": FND.snippets_sql(tr),
        "kg_mention_counts": G.mention_counts_sql(tr),
        "kg_entities_exact": G.entities_exact_sql(tr),
        "kg_mention_chains": CH.mention_chains_sql(tr),
        "kg_cooccurrence": CH.cooccurrence_sql(tr),
        "kg_reachable": RCH.reachable_sql(tr),
        "kg_paths": RCH.paths_sql(tr),
        "kg_slice": RCH.slice_sql(tr),
        "kg_tool_imports": f"""
            SELECT conv_id, turn_idx,
                   lower(regexp_extract(text,
                     '^Calling ([a-z0-9_]+) now\\.$', 1)) AS tool_norm
            FROM {tr}
            WHERE regexp_matches(text, '^Calling ([a-z0-9_]+) now\\.$')""",
        "kg_tool_registry": f"""
            SELECT tool, count(*) AS n_invocations,
                   CAST(min(turn_idx) AS BIGINT) AS first_turn
            FROM {tr} WHERE role = 'tool' AND tool IS NOT NULL
            GROUP BY tool""",
        "kg_kind_recovery": _kind_recovery_sql(tr),
        "kg_triangles": GS.triangles_sql(tr),
        "kg_kcore": GS.kcore_sql(tr),
        "kg_conv_tools": FND.conv_tools_sql(tr),
        "kg_next_turn_edges": f"""
            SELECT conv_id || '#' || CAST(turn_idx - 1 AS VARCHAR) AS src,
                   conv_id || '#' || CAST(turn_idx AS VARCHAR) AS dst,
                   conv_id, turn_idx
            FROM {tr} WHERE turn_idx > 0""",
        # dominator trees over the per-conversation NEXT_TURN chain: the
        # chain is linear, so idom(t)=t-1 (entry NULL), ipdom(t)=t+1 (exit
        # NULL) — exactly expressible in SQL; branching graphs are covered
        # by pytest DAG goldens (tests/test_dom.py).  The engine derives its
        # node set from NEXT_TURN edge endpoints, so the oracle (a) dedupes
        # on (conv_id, turn_idx) — dirty duplicate-turn input — and (b)
        # skips single-turn conversations (no edges ⇒ no engine rows).
        "kg_dominators": f"""
            WITH turns AS (SELECT DISTINCT conv_id, turn_idx FROM {tr}),
            multi AS (SELECT conv_id FROM turns
                      GROUP BY conv_id HAVING count(*) >= 2)
            SELECT conv_id,
                   conv_id || '#' || CAST(turn_idx AS VARCHAR) AS node,
                   CASE WHEN turn_idx = 0 THEN NULL
                        ELSE conv_id || '#' || CAST(turn_idx - 1 AS VARCHAR)
                   END AS idom
            FROM turns WHERE conv_id IN (SELECT conv_id FROM multi)""",
        "kg_post_dominators": f"""
            WITH turns AS (SELECT DISTINCT conv_id, turn_idx FROM {tr}),
            multi AS (SELECT conv_id FROM turns
                      GROUP BY conv_id HAVING count(*) >= 2)
            SELECT conv_id,
                   conv_id || '#' || CAST(turn_idx AS VARCHAR) AS node,
                   CASE WHEN turn_idx = max_t THEN NULL
                        ELSE conv_id || '#' || CAST(turn_idx + 1 AS VARCHAR)
                   END AS idom
            FROM (SELECT conv_id, turn_idx,
                         max(turn_idx) OVER (PARTITION BY conv_id) AS max_t
                  FROM turns)
            WHERE conv_id IN (SELECT conv_id FROM multi)""",
        # control dependence over chain + skip-edge diamonds: each skip
        # source s ((s % 5) = 2, s+2 ≤ max turn) yields exactly the CDG
        # edge (s, s+1) — closed form validated against the Ferrante
        # implementation on branching goldens (tests/test_dom.py)
        "kg_cdg": f"""
            WITH turns AS (SELECT DISTINCT conv_id, turn_idx FROM {tr}),
            mx AS (SELECT conv_id, max(turn_idx) AS max_t
                   FROM turns GROUP BY conv_id)
            SELECT t.conv_id,
                   t.conv_id || '#' || CAST(t.turn_idx AS VARCHAR) AS ctrl,
                   t.conv_id || '#' || CAST(t.turn_idx + 1 AS VARCHAR)
                     AS node
            FROM turns t JOIN mx ON t.conv_id = mx.conv_id
            WHERE t.turn_idx % 5 = 2 AND t.turn_idx + 2 <= mx.max_t""",
        "rel_q1_pricing": REL.q1_pricing_sql(),
        "rel_topk_orders": REL.topk_orders_sql(),
        "rel_topk_per_customer": REL.topk_orders_per_customer_sql(),
        "rel_price_quantiles": REL.price_quantiles_by_segment_sql(),
        "rel_orders_by_segment": REL.orders_by_segment_sql(),
        "rel_customers_without_orders": REL.customers_without_orders_sql(),
        "rel_suppliers_with_shipments": REL.suppliers_with_shipments_sql(),
        "rel_distinct_part_types": REL.distinct_part_types_sql(),
        "rel_revenue_by_nation": REL.revenue_by_nation_sql(),
        "rel_events_by_user": REL.events_by_user_sql(),
        "rel_filter_project_parts": REL.filter_project_parts_sql(),
        "rel_running_order_total": REL.running_order_total_sql(),
        "text_stats": T.text_stats_sql(),
        "text_lang_id": T.lang_id_sql(),
        "text_fingerprint": T.doc_fingerprint_sql(),
        "text_token_counts": T.token_counts_sql(),
        "text_quality": T.text_quality_sql(),
        "dedup_exact": T.dedup_exact_sql(),
        "dedup_snapshot": T.snapshot_dedup_sql(),
        "text_source_overlap": T.source_overlap_sql(),
        "text_sample_weighted": T.sample_weighted_sql(),
        "rel_order_gaps": REL.order_gaps_sql(),
        "text_clean_corpus": T.clean_corpus_sql(),
        "conv_line_dedup": T.line_dedup_sql(tr),
        "text_bigram_lm": T.bigram_lm_sql(),
        "text_dsir_weights": T.dsir_weights_sql(),
        "text_dup_spans": T.dup_spans_sql(),
        "text_sample_stratified": T.sample_stratified_sql(),
        "text_token_bins": T.token_bins_sql(),
        "text_redact_persons": T.redact_persons_sql(tr),
        "text_repetition": T.repetition_stats_sql(),
        "text_familiarity": T.familiarity_sql(),
        "text_decontaminate": T.decontaminate_sql(),
        "text_decontaminate_ngram": T.decontaminate_ngram_sql(),
        "text_tfidf_topk": T.tfidf_topk_sql(),
        "text_source_mix_weights": T.source_mix_weights_sql(),
        "text_top_tokens": T.top_tokens_sql(),
        "events_sessionize": EV.sessionize_sql(),
        "events_window_counts": EV.window_counts_sql(),
        "events_sliding_counts": EV.sliding_window_counts_sql(),
        "events_asof_prior_view": EV.asof_prior_view_sql(),
        "events_props_k_stats": EV.props_k_stats_sql(),
        "events_funnel": EV.funnel_sql(),
        "events_retention": EV.retention_sql(),
        "events_daily_anomaly": EV.daily_anomaly_sql(),
        "ann_topk": A.ann_bruteforce_sql(),
        "embedding_neardup": A.embedding_neardup_planted_sql(),
        "embedding_decontaminate": A.embedding_decontaminate_sql(),
        "dedup_semantic_planted": A.dedup_semantic_planted_sql(),
        "dedup_ngram_pairs": T.ngram_jaccard_pairs_sql(),
        "text_bpe_token_counts": T.bpe_token_counts_sql(
            T.train_bpe_merges(SF_ORACLE)),
        "dedup_simhash_planted": T.dedup_simhash_planted_sql(),
        "dedup_simhash_clusters_planted":
            T.dedup_simhash_clusters_planted_sql(),
    }
