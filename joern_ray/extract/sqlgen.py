"""DuckDB oracle-SQL generators for the transcript extraction pipeline.

Built programmatically from the shared rule pack (joern_ray.functions.rules)
so the patterns have a single source of truth; the SQL *implementation*
(regexp kernels + window functions) is independent of the Ray implementation
(Arrow kernels + bucketed forward-fill), which is what makes the comparison
meaningful — the analog of the reference's ``compareJson.py`` dual-run
harness.
"""

from __future__ import annotations

from ..functions import rules as R


def _plain(rx: str) -> str:
    """Named capture groups → plain groups (group 1 = subj, 2 = obj for
    templates; group 1 = obj for pronoun templates)."""
    return (rx.replace("(?P<subj>", "(").replace("(?P<obj>", "(")
            .replace("'", "''"))


def events_sql(rel: str) -> str:
    """All extraction events with kinds + etype — the Stage-A analog."""
    parts = []
    for pred, rx, ok in R.PRONOUN_TEMPLATES:
        rxs = _plain(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'pronoun' AS etype,
               CAST(NULL AS VARCHAR) AS subj, '{pred}' AS pred,
               regexp_extract(text, '{rxs}', 1) AS obj,
               'person' AS subj_kind, '{ok}' AS obj_kind
        FROM {rel} WHERE regexp_matches(text, '{rxs}')""")
    for pred, rx, sk, ok in R.TEMPLATES:
        rxs = _plain(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'triple',
               regexp_extract(text, '{rxs}', 1), '{pred}',
               regexp_extract(text, '{rxs}', 2), '{sk}', '{ok}'
        FROM {rel}
        WHERE regexp_matches(text, '{rxs}')
          AND regexp_extract(text, '{rxs}', 1) NOT IN ('She', 'He')
          AND NOT regexp_matches(text, '^(She|He) ')""")
    parts.append(f"""
        SELECT conv_id, turn_idx, 'triple', conv_id, '{R.INVOKED_PRED}',
               tool, 'conv', 'tool'
        FROM {rel} WHERE role = 'tool' AND tool IS NOT NULL""")
    return " UNION ALL ".join(parts)


def resolved_triples_sql(rel: str) -> str:
    """Surface triples with pronouns resolved (the shared resolution rule:
    referent = last person slot in any strictly-earlier turn; resolved
    triples don't update the referent; unresolvable pronouns drop)."""
    return f"""
    WITH ev AS ({events_sql(rel)}),
    st AS (
      SELECT *,
             CASE WHEN etype = 'triple' THEN
               CASE WHEN obj_kind = 'person' THEN obj
                    WHEN subj_kind = 'person' THEN subj END
             END AS person
      FROM ev),
    r AS (
      SELECT *,
             last_value(person IGNORE NULLS) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_person
      FROM st)
    SELECT conv_id, turn_idx,
           CASE WHEN etype = 'pronoun' THEN prev_person ELSE subj END
             AS subj,
           pred, obj, subj_kind, obj_kind
    FROM r
    WHERE etype = 'triple' OR prev_person IS NOT NULL
    """


def _norm_expr(col: str, kind_col: str) -> str:
    """SQL mirror of link.normalize_arrays / rules.normalize_surface."""
    low = f"trim(lower({col}))"
    stripped = (f"regexp_replace({low}, "
                r"'\b(corp|corporation|inc|labs|llc|ltd|the|group)\b'"
                f", '', 'g')")
    squeezed = rf"trim(regexp_replace({stripped}, '\s+', ' ', 'g'))"
    org = f"CASE WHEN {squeezed} = '' THEN {low} ELSE {squeezed} END"
    return f"CASE WHEN {kind_col} = 'org' THEN {org} ELSE {low} END"


def entities_exact_sql(rel: str) -> str:
    """Entity directory restricted to exact-key kinds (everything but the
    fuzzy LSH/union-find kinds, which are not SQL-expressible): canonical
    form is the normalized key itself."""
    from ..functions import rules as R
    excluded = sorted(R.FUZZY_KINDS | R.NONLINK_KINDS)
    ex_list = ", ".join(f"'{k}'" for k in excluded)
    return f"""
    WITH resolved AS ({resolved_triples_sql(rel)}),
    m AS (
      SELECT subj_kind AS kind, {_norm_expr('subj', 'subj_kind')} AS norm
      FROM resolved
      UNION ALL
      SELECT obj_kind, {_norm_expr('obj', 'obj_kind')} FROM resolved)
    SELECT DISTINCT kind, norm, norm AS canonical
    FROM m WHERE kind NOT IN ({ex_list})
    """


def mention_counts_sql(rel: str) -> str:
    """(kind, norm) → mention count over both slots of resolved triples."""
    return f"""
    WITH resolved AS ({resolved_triples_sql(rel)}),
    m AS (
      SELECT subj_kind AS kind, {_norm_expr('subj', 'subj_kind')} AS norm
      FROM resolved
      UNION ALL
      SELECT obj_kind, {_norm_expr('obj', 'obj_kind')} FROM resolved)
    SELECT kind, norm, count(*) AS n_mentions FROM m GROUP BY 1, 2
    """
