"""Serve-from-artifact DuckDB formulations for the artifact-served
bench queries (the `art` rows of tools/bench_compare.py).

The standard oracle recomputes each pipeline from base parquet every
run — the right shape for the VALUE gate, but an asymmetric timing
comparison once the Spark side serves from the written sidecar tier:
the `art` rows compare a warm probe against a full recompute. This
module closes that asterisk: for every art query it restates the
DuckDB side to serve from the SAME written artifact (the sidecar
parquet registered via read_parquet), paying only the query-side
residual compute — a true engine-vs-engine SERVING comparison.

Each entry is a callable(ctx) -> SQL string; ``ctx`` resolves sidecar
data paths and scalar metadata for the bench SF and exposes the base
tables as the usual DuckDB views. ``tools/bench_compare.py
--oracle-artifacts`` times these against the Spark serving path and
VALIDATES each serve form against the full-recompute oracle before
trusting its timing (a serve form that disagrees is reported, not
timed).

Derivations mirror plans/entry_queries.py ORACLE_SQL with the
artifact-derivation CTEs replaced by artifact reads; the residual SQL
is kept verbatim so the value semantics are unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: Source parquet files each artifact family fingerprints against —
#: mirrors the builders in plans/entry_queries.py (every _artifact_df
#: family plus bm25_tf/unigram_lm derive from documents.parquet; the
#: ANN index derives from embeddings.parquet).
FAMILY_SOURCES: dict[str, tuple[str, ...]] = {
    "ivfpq_index": ("embeddings.parquet",),
}
_DEFAULT_SOURCES: tuple[str, ...] = ("documents.parquet",)


class ArtifactCtx:
    """Resolves committed sidecar artifacts for one dataset dir.

    Every access validates the committed artifact's recorded source
    fingerprint against the CURRENT corpus files (the same derivation
    ``_artifact_df`` uses), so a serve form invoked outside the
    bench_compare flow — where the Spark warm-up has just rebuilt and
    validated the artifact — fails loudly instead of silently timing a
    stale artifact built from a different corpus state. Pass
    ``validate_fingerprint=False`` only when the caller has its own
    staleness guarantee."""

    def __init__(self, sf_dir: str, validate_fingerprint: bool = True):
        from stac_fastapi_duckdb_spark.sources import sidecar as sc

        self._sc = sc
        self.sf = sf_dir
        self.tag = sc.dataset_tag(sf_dir)
        self._validate = validate_fingerprint
        self._fp_cache: dict[tuple[str, ...], str] = {}

    def _expected_fp(self, family: str) -> str:
        srcs = FAMILY_SOURCES.get(family, _DEFAULT_SOURCES)
        if srcs not in self._fp_cache:
            self._fp_cache[srcs] = self._sc.source_fingerprint(
                *[os.path.join(self.sf, s) for s in srcs]
            )
        return self._fp_cache[srcs]

    def _extra_validated(self, family: str) -> dict:
        extra = self._sc.load_meta(family, self.tag, self._expected_fp(family))
        if extra is None:
            raise RuntimeError(
                f"sidecar {family}/{self.tag} is absent or stale for the "
                f"current corpus at {self.sf} — run the Spark query first "
                "to (re)build it, or pass validate_fingerprint=False"
            )
        return extra

    def art(self, family: str) -> str:
        """SQL argument for read_parquet() over the committed artifact
        (single dir or base+delta list), fingerprint-validated."""
        if self._validate:
            self._extra_validated(family)
        dirs = self._sc.data_paths(family, self.tag)
        if len(dirs) == 1:
            return f"'{dirs[0]}/*.parquet'"
        return "[" + ", ".join(f"'{d}/*.parquet'" for d in dirs) + "]"

    def meta(self, family: str) -> dict:
        if self._validate:
            return self._extra_validated(family)
        m = self._sc._read_meta(family, self.tag, None)
        if m is None:
            raise FileNotFoundError(f"no committed sidecar for {family}")
        return m.get("extra", {})


# --- shared literal builders (frozen index artifacts) -----------------------


def _ivf_cents_values() -> str:
    from stac_fastapi_duckdb_spark.plans.entry_queries import (
        _ivf_centroids_values_sql,
    )

    return _ivf_centroids_values_sql()


def _pq_lut_dist(code_expr: str, probe_vec: str) -> str:
    """ADC distance with the row's code READ from the artifact
    (1-based, matching pq_code_col) instead of recomputed: the probe
    LUT keeps the exact sequential (p-c)*(p-c) fold of the full
    oracle, so distances stay bit-identical."""
    from stac_fastapi_duckdb_spark.plans.pq_index import PQ_CODEBOOKS

    m = len(PQ_CODEBOOKS)
    dsub = len(PQ_CODEBOOKS[0][0])

    def lst(v):
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    def cb_lit(j):
        return "[" + ", ".join(lst(c) for c in PQ_CODEBOOKS[j]) + "]::DOUBLE[][]"

    def lut(j):
        off = j * dsub
        return (
            f"list_transform({cb_lit(j)}, cent -> list_sum("
            f"list_transform(range(1, {dsub + 1}), i -> "
            f"({probe_vec}[{off}+i]-cent[i])*({probe_vec}[{off}+i]-cent[i]))))"
        )

    return " + ".join(
        f"({lut(j)})[{code_expr}[{j + 1}]]" for j in range(m)
    )


def _probe_cells_sql(nprobe: int = 4) -> str:
    """Probe-side IVF cell ranking from the frozen centroid literals —
    only the probe row is scored (the corpus assignment is read from
    the artifact)."""
    return f"""
        pd AS (
            SELECT c.c AS cell,
                   list_sum(list_transform(range(1, 65),
                                           i -> (p.pv[i] - c.cv[i]) ** 2)) AS dsq
            FROM probe p CROSS JOIN {_ivf_cents_values()} AS c(c, cv)
        ), probe_cells AS (
            SELECT cell FROM (
                SELECT cell, row_number() OVER (ORDER BY dsq ASC, cell ASC) AS rn
                FROM pd) WHERE rn <= {nprobe}
        )"""


# --- serve forms ------------------------------------------------------------


def _bm25_core(ctx: ArtifactCtx) -> str:
    meta = ctx.meta("bm25_tf")
    n, avgdl = int(meta["n_docs"]), float(meta["avgdl"])
    return f"""
        tf AS (
            SELECT doc_id, dl, term, tf FROM read_parquet({ctx.art("bm25_tf")})
            WHERE term IN ('join', 'scan', 'filter')
        ),
        sc AS (
            SELECT doc_id,
                   ln(1.0 + ({n} - (COUNT(*) OVER (PARTITION BY term)) + 0.5)
                            / ((COUNT(*) OVER (PARTITION BY term)) + 0.5))
                   * (tf * (1.2 + 1))
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / {avgdl!r})) AS s
            FROM tf
        )"""


def norm_rows(rows):
    """Order- and float-noise-insensitive row canonicalization at the
    contract's round-6 scale — the ONE definition shared by the bench
    runtime validation (tools/bench_compare.py) and the pytest pin
    (tests/test_oracle_artifact_sql.py), so the two gates cannot
    silently diverge."""
    out = []
    for r in rows:
        out.append(
            tuple(round(x, 6) if isinstance(x, float) else x for x in r)
        )
    return sorted(out, key=repr)


def _span_removal_tail(k: int = 8) -> str:
    """The shared islands → intervals → token-rebuild SQL tail over a
    ``marked(doc_id, pos)`` CTE of duplicated window positions and a
    ``t(doc_id, toks)`` CTE of the documents being cleaned — identical
    (including the interval bound arithmetic) for every span-removal
    consumer, factored so a fix to the math cannot drift between
    forms."""
    return f"""mk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos, 1, -9) OVER
                                (PARTITION BY doc_id ORDER BY pos) > {k}
                        THEN 1 ELSE 0 END AS nw
            FROM marked
        ), isl AS (
            SELECT doc_id, pos,
                   sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS isl
            FROM mk
        ), iv AS (
            SELECT doc_id, min(pos) AS lo, max(pos) + {k} - 1 AS hi
            FROM isl GROUP BY doc_id, isl
        ), tok AS (
            SELECT doc_id, unnest(generate_series(1, len(toks))) - 1 AS p,
                   toks
            FROM t
        ), tk AS (
            SELECT doc_id, p, toks[p + 1] AS tk FROM tok
        ), rm AS (
            SELECT DISTINCT k.doc_id, k.p
            FROM tk k JOIN iv ON k.doc_id = iv.doc_id
                            AND k.p BETWEEN iv.lo AND iv.hi
        ), kept AS (
            SELECT tk.doc_id,
                   coalesce(string_agg(tk.tk, ' ' ORDER BY tk.p), '')
                       AS clean_text
            FROM tk LEFT JOIN rm ON tk.doc_id = rm.doc_id AND tk.p = rm.p
            WHERE rm.p IS NULL
            GROUP BY tk.doc_id
        ), rmn AS (
            SELECT doc_id, count(*) AS n_removed FROM rm GROUP BY doc_id
        )
    SELECT t.doc_id,
           coalesce(k.clean_text, '') AS clean_text,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(rmn.n_removed, 0) AS BIGINT) AS n_removed
    FROM t LEFT JOIN kept k ON t.doc_id = k.doc_id
           LEFT JOIN rmn ON t.doc_id = rmn.doc_id
    """


def _line_keep_agg(art_sql: str, keep_col: str = "_keep") -> str:
    """The shared keep-verdict groupBy rebuild over a written
    (doc_id, pos, line, _keep) verdict sidecar — line_dedup and
    incremental_line_dedup differ only in which family they read."""
    return f"""
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN {keep_col} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               COALESCE(
                   string_agg(CASE WHEN {keep_col} THEN line END, chr(10)
                              ORDER BY pos),
                   '') AS text_deduped
        FROM read_parquet({art_sql}) GROUP BY doc_id
    """


def bm25_search(ctx):
    return f"""
        WITH {_bm25_core(ctx)}
        SELECT doc_id, ROUND(SUM(s), 6) AS score FROM sc GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 10
    """


def hybrid_search(ctx):
    return f"""
        WITH {_bm25_core(ctx)},
        bm AS (
            SELECT doc_id, ROUND(SUM(s), 6) AS bm25 FROM sc GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id ASC LIMIT 50
        ),
        probe AS (
            SELECT CAST(embedding AS DOUBLE[]) AS pv
            FROM embeddings WHERE vec_id = 0
        ),
        rr AS (
            SELECT bm.doc_id, bm.bm25,
                   ROUND(list_cosine_similarity(
                       CAST(emb.embedding AS DOUBLE[]), probe.pv), 6) + 0.0 AS cos_sim
            FROM bm JOIN embeddings emb ON emb.vec_id = bm.doc_id, probe
        )
        SELECT doc_id, bm25, cos_sim,
               ROUND(0.1 * bm25 + cos_sim, 6) + 0.0 AS hybrid
        FROM rr
        ORDER BY hybrid DESC, doc_id ASC LIMIT 10
    """


def _lm_core(ctx: ArtifactCtx) -> str:
    return f"""
        lm AS (
            SELECT token, logprob FROM read_parquet({ctx.art("unigram_lm")})
            WHERE token IS NOT NULL
        ), oov AS (
            SELECT logprob AS o FROM read_parquet({ctx.art("unigram_lm")})
            WHERE token IS NULL
        ), tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
            FROM documents
        )"""


def lm_perplexity(ctx):
    return f"""
        WITH {_lm_core(ctx)}
        SELECT tok.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               ROUND(avg(-coalesce(lm.logprob, oov.o)), 6) AS avg_nll
        FROM tok LEFT JOIN lm USING (token), oov
        GROUP BY tok.doc_id
    """


def quality_tiers(ctx):
    # round 11: the scored table itself is the artifact (lm_scores) —
    # the serve residual is the ntile window alone, on both engines
    return f"""
        WITH tiered AS (
            SELECT doc_id, lang, n_tokens, avg_nll,
                   CAST(ntile(3) OVER (PARTITION BY lang
                                       ORDER BY avg_nll ASC, doc_id ASC)
                        AS BIGINT) AS tier
            FROM read_parquet({ctx.art("lm_scores")})
        )
        SELECT doc_id, lang, n_tokens, avg_nll, tier,
               CASE WHEN tier = 1 THEN 'head'
                    WHEN tier = 3 THEN 'tail'
                    ELSE 'middle' END AS tier_label
        FROM tiered
    """


def top_bigrams(ctx):
    return f"""
        SELECT gram, cnt FROM read_parquet({ctx.art("ngram_counts_2")})
        ORDER BY cnt DESC, gram ASC LIMIT 100
    """


def multimodal_features(ctx):
    return f"""
        SELECT media_id, kind, n_bytes,
               array_to_string(list_transform(features,
                   x -> printf('%.8f', CAST(x AS DOUBLE))), ',') AS features_csv
        FROM read_parquet({ctx.art("media_features")})
    """


def edit_distance_pairs(ctx):
    return f"""
        SELECT id_a, id_b, dist FROM read_parquet({ctx.art("edit_pairs")})
    """


def line_dedup(ctx):
    return _line_keep_agg(ctx.art("flagged_lines"))


def incremental_line_dedup(ctx):
    return _line_keep_agg(ctx.art("incr_flagged"))


def span_dedup(ctx):
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS toks
            FROM documents
        ), cov AS (
            SELECT DISTINCT doc_id, p + off AS ti
            FROM (SELECT doc_id, unnest(_dup_pos) AS p
                  FROM read_parquet({ctx.art("span_dup_map")})),
                 unnest(range(0, 4)) AS o(off)
        ), tok_rows AS (
            SELECT doc_id, unnest(toks) AS tok,
                   unnest(range(0, len(toks))) AS ti
            FROM toks
        ), marked AS (
            SELECT r.doc_id, r.tok, r.ti, (c.ti IS NOT NULL) AS rem
            FROM tok_rows r
            LEFT JOIN cov c ON r.doc_id = c.doc_id AND r.ti = c.ti
        ), agg AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN rem THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_removed,
                   COALESCE(string_agg(CASE WHEN NOT rem THEN tok END,
                                       ' ' ORDER BY ti), '')
                       AS text_deduped
            FROM marked GROUP BY doc_id
        )
        SELECT t.doc_id,
               COALESCE(a.n_tokens, 0) AS n_tokens,
               COALESCE(a.n_removed, 0) AS n_removed,
               COALESCE(a.text_deduped, '') AS text_deduped
        FROM toks t LEFT JOIN agg a USING (doc_id)
    """


def duplicate_spans(ctx):
    return f"""
        WITH dup AS (
            SELECT doc_id, pos
            FROM read_parquet({ctx.art("doubled_fp_annotated")})
            WHERE _docs >= 2
        ), marked AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos, 1, -9) OVER
                                (PARTITION BY doc_id ORDER BY pos) > 8
                        THEN 1 ELSE 0 END AS nw
            FROM dup
        ), isl AS (
            SELECT doc_id, pos,
                   sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS isl
            FROM marked
        )
        SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_len,
               count(*) AS n_windows
        FROM isl GROUP BY doc_id, isl
    """


def remove_duplicate_spans(ctx):
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 10000, text FROM documents
        ), t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM corpus
        ), marked AS (
            SELECT DISTINCT doc_id, pos
            FROM read_parquet({ctx.art("doubled_fp_annotated")})
            WHERE _docs >= 2 AND doc_id <> _owner
        ), {_span_removal_tail(8)}
    """


def decontaminate(ctx):
    return f"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents
    ), bfp AS (
        SELECT fp FROM read_parquet({ctx.art("bench_fps")})
    ), fps AS (
        SELECT doc_id, pos, fp FROM read_parquet({ctx.art("fp_stream")})
    ), marked AS (
        SELECT DISTINCT f.doc_id, f.pos FROM fps f JOIN bfp USING (fp)
    ), {_span_removal_tail(8)}
    """


def ngram_novelty(ctx):
    return f"""
        WITH sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
                ELSE [array_to_string(t, ' ')] END AS s
    FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
          FROM documents)
),
        novel AS (
            SELECT doc_id, n_novel FROM read_parquet({ctx.art("novelty_counts")})
        )
        SELECT sh.doc_id,
               CAST(len(sh.s) AS BIGINT) AS n_grams,
               CAST(COALESCE(novel.n_novel, 0) AS BIGINT) AS n_novel,
               ROUND(CAST(COALESCE(novel.n_novel, 0) AS DOUBLE)
                     / len(sh.s), 6) AS novelty_frac
        FROM sh LEFT JOIN novel USING (doc_id)
    """


def hash_embed(ctx):
    return f"""
        SELECT doc_id, CAST(i AS INT) AS pos, ROUND(vec[i + 1], 6) AS val
        FROM read_parquet({ctx.art("hashed_vecs")}),
             unnest(range(0, 32)) AS u(i)
    """


def hashed_text_topk(ctx):
    return f"""
        WITH v AS (
            SELECT doc_id, vec FROM read_parquet({ctx.art("hashed_vecs")})
        ), p AS (SELECT vec AS pv FROM v WHERE doc_id = 0)
        SELECT v.doc_id,
               ROUND(list_dot_product(v.vec, p.pv), 6) AS score
        FROM v, p WHERE v.doc_id <> 0
        ORDER BY score DESC, v.doc_id ASC LIMIT 10
    """


def ann_ivf_topk(ctx):
    return f"""
        WITH idx AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, ivf_cell AS cell
            FROM read_parquet({ctx.art("ivfpq_index")}) WHERE vec_id <> 0
        ), probe AS (
            SELECT CAST(embedding AS DOUBLE[]) AS pv
            FROM embeddings WHERE vec_id = 0
        ), {_probe_cells_sql(4)}
        SELECT i.vec_id, ROUND(list_cosine_similarity(i.v, p.pv), 6) AS cos_sim
        FROM idx i, probe p
        WHERE i.cell IN (SELECT cell FROM probe_cells)
        ORDER BY cos_sim DESC, i.vec_id ASC
        LIMIT 10
    """


def ann_pq_topk(ctx):
    dist = _pq_lut_dist("a.pq_code", "p.pe")
    return f"""
        SELECT vec_id, floor(dist * 1e6 + 0.5) / 1e6 AS adc_dist FROM (
            SELECT a.vec_id AS vec_id, {dist} AS dist
            FROM (SELECT vec_id, pq_code
                  FROM read_parquet({ctx.art("ivfpq_index")})
                  WHERE vec_id <> 0) a,
                 (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0) p
        )
        ORDER BY floor(dist * 1e6 + 0.5) / 1e6 ASC, vec_id ASC
        LIMIT 10
    """


def ann_ivfpq_topk(ctx):
    dist = _pq_lut_dist("a.pq_code", "p.pe")
    return f"""
        WITH probe AS (
            SELECT CAST(embedding AS DOUBLE[]) AS pv, embedding AS pe
            FROM embeddings WHERE vec_id = 0
        ), {_probe_cells_sql(4)}
        SELECT vec_id, floor(dist * 1e6 + 0.5) / 1e6 AS adc_dist FROM (
            SELECT a.vec_id AS vec_id, {dist} AS dist
            FROM (SELECT vec_id, pq_code, ivf_cell
                  FROM read_parquet({ctx.art("ivfpq_index")})
                  WHERE vec_id <> 0) a,
                 probe p
            WHERE a.ivf_cell IN (SELECT cell FROM probe_cells)
        )
        ORDER BY floor(dist * 1e6 + 0.5) / 1e6 ASC, vec_id ASC
        LIMIT 10
    """


def semdedup(ctx):
    return f"""
        WITH assigned AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   ivf_cell AS cell
            FROM read_parquet({ctx.art("ivfpq_index")})
            UNION ALL
            SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]), ivf_cell
            FROM read_parquet({ctx.art("ivfpq_index")})
        ), pairs AS (
            SELECT b.vec_id AS drop_id, a.vec_id AS keep_id,
                   CAST(a.cell AS BIGINT) AS cluster,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
        )
        SELECT drop_id, keep_id, cluster, cos_sim FROM (
            SELECT drop_id, keep_id, cluster, cos_sim,
                   row_number() OVER (PARTITION BY drop_id
                                      ORDER BY keep_id ASC) AS rn
            FROM pairs WHERE cos_sim >= 0.95)
        WHERE rn = 1
    """


#: query name -> callable(ctx) -> serve-form SQL. Families each form
#: reads are documented in the builder; every form is validated against
#: the full-recompute oracle before its timing is trusted.
SERVE_SQL = {
    "bm25_search": bm25_search,
    "hybrid_search": hybrid_search,
    "lm_perplexity": lm_perplexity,
    "quality_tiers": quality_tiers,
    "top_bigrams": top_bigrams,
    "multimodal_features": multimodal_features,
    "edit_distance_pairs": edit_distance_pairs,
    "line_dedup": line_dedup,
    "incremental_line_dedup": incremental_line_dedup,
    "span_dedup": span_dedup,
    "duplicate_spans": duplicate_spans,
    "remove_duplicate_spans": remove_duplicate_spans,
    "decontaminate": decontaminate,
    "ngram_novelty": ngram_novelty,
    "hash_embed": hash_embed,
    "hashed_text_topk": hashed_text_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "semdedup": semdedup,
}
