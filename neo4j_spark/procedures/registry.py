"""Procedure registry — CALL name(args) YIELD cols.

Mirrors the reference's builtin procedure library (reference:
``community/procedure/src/main/java/org/neo4j/procedure/builtin/BuiltInProcedures.java``
for db.labels/db.relationshipTypes/db.propertyKeys,
``VectorIndexProcedures.java:144`` for db.index.vector.queryNodes,
``FulltextProcedures.java:120`` for db.index.fulltext.queryNodes).
A procedure is a Python callable ``(spark, graph, args) -> DataFrame``.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph import PropertyGraph

PROCEDURES: Dict[str, Callable[..., DataFrame]] = {}

# set-oriented variants for correlated CALL proc(expr): instead of one
# plan branch per distinct argument tuple, the translator hands the whole
# distinct first-argument frame to the variant in ONE invocation
# (fn(spark, graph, args_frame, const_args) -> DataFrame that includes the
# frame's argument column for the join-back)
SET_PROCEDURES: Dict[str, Callable[..., DataFrame]] = {}


def procedure(name: str):
    def deco(fn):
        PROCEDURES[name] = fn
        return fn

    return deco


def set_procedure(name: str):
    def deco(fn):
        SET_PROCEDURES[name] = fn
        return fn

    return deco


class ProcedureError(ValueError):
    pass


# VOID procedures (no output columns): legal mid-query without YIELD —
# everything else must name results explicitly there
# (ProcedureAcceptance 'Non-void-procedure call after a MATCH clause
# fails'; the reference's signatures mark these `:: VOID`)
VOID_PROCEDURES = {
    "db.awaitindex", "db.awaitindexes",
    "db.index.fulltext.awaiteventuallyconsistentindexrefresh",
    "db.resampleindex", "db.resampleoutdatedindexes",
    "db.clearquerycaches", "db.prepareforreplanning",
    "db.createlabel", "db.createproperty", "db.createrelationshiptype",
    "db.create.setvectorproperty", "db.create.setnodevectorproperty",
    "db.index.vector.setnodevectorproperty",
    "db.create.setrelationshipvectorproperty",
    "tx.setmetadata",
}


def procedure_is_void(name: str) -> bool:
    return name.lower() in VOID_PROCEDURES


def run_procedure(spark: SparkSession, graph: PropertyGraph, name: str,
                  args: List[Any]) -> DataFrame:
    fn = PROCEDURES.get(name.lower())
    if fn is None:
        raise ProcedureError(f"unknown procedure {name}")
    return fn(spark, graph, args)


# ---- catalog procedures ---------------------------------------------------


@procedure("db.labels")
def db_labels(spark, graph, args):
    return spark.createDataFrame([(l,) for l in graph.labels()], "label string")


@procedure("db.relationshiptypes")
def db_rel_types(spark, graph, args):
    return spark.createDataFrame(
        [(t,) for t in graph.relationship_types()], "relationshipType string")


@procedure("db.propertykeys")
def db_property_keys(spark, graph, args):
    return spark.createDataFrame(
        [(k,) for k in graph.node_property_keys()], "propertyKey string")


# ---- graph algorithms (graph-algo module parity) ---------------------------


@procedure("algo.connectedcomponents")
def algo_connected_components(spark, graph, args):
    """() -> (node, comp): undirected connected components (min-id labels)."""
    from ..operators.algorithms import connected_components

    nodes = graph.nodes.select("id")
    rels = graph.rels.select("src", "dst")
    return connected_components(nodes, rels).select(
        F.col("id").alias("node"), F.col("comp"))


@procedure("algo.pagerank")
def algo_pagerank(spark, graph, args):
    """(iterations=10, damping=0.85) -> (node, rank)."""
    from ..operators.algorithms import pagerank

    iters = int(args[0]) if len(args) > 0 else 10
    damping = float(args[1]) if len(args) > 1 else 0.85
    nodes = graph.nodes.select("id")
    rels = graph.rels.select("src", "dst")
    return pagerank(nodes, rels, iters, damping).select(
        F.col("id").alias("node"), F.round(F.col("rank"), 8).alias("rank"))


@procedure("algo.shortestpathlengths")
def algo_sssp(spark, graph, args):
    """(sourceNodeId, weightProp?, directed?) -> (node, dist) — Dijkstra
    parity (graph-algo/.../Dijkstra.java) as a delta-iteration loop."""
    from ..operators.algorithms import sssp

    src_id = int(args[0])
    weight = str(args[1]) if len(args) > 1 and args[1] is not None else None
    directed = bool(args[2]) if len(args) > 2 else True
    sources = spark.createDataFrame([(src_id,)], "id long")
    rels = graph.rels
    return sssp(rels, sources, weight, directed).select(
        F.col("id").alias("node"), F.col("dist"))


@set_procedure("algo.shortestpathlengths")
def algo_sssp_set(spark, graph, args_frame, const_args):
    """Set-oriented correlated variant: args_frame has one column (the
    source node ids); ONE per-source relaxation loop over (source x node)
    keys replaces N driver-planned branches."""
    from ..operators.algorithms import sssp

    weight = (str(const_args[0])
              if const_args and const_args[0] is not None else None)
    directed = bool(const_args[1]) if len(const_args) > 1 else True
    arg_col = args_frame.columns[0]
    sources = args_frame.select(
        F.col(arg_col).cast("long").alias("id")).dropDuplicates()
    out = sssp(graph.rels, sources, weight, directed, per_source=True)
    return out.select(F.col("source").alias(arg_col),
                      F.col("id").alias("node"), F.col("dist"))


@procedure("algo.degreecentrality")
def algo_degree_centrality(spark, graph, args):
    """() -> (node, out_degree, in_degree, degree) — getDegree parity
    (graphdb-api/Node.java:236-263) as two map-side-combined counts."""
    from ..operators.algorithms import degree_centrality

    return degree_centrality(graph.nodes, graph.rels).select(
        F.col("id").alias("node"), "out_degree", "in_degree", "degree")


@procedure("algo.trianglecount")
def algo_triangle_count(spark, graph, args):
    """() -> (node, triangles) — per-node triangle participation over the
    undirected simple graph (ordered-wedge two-join formulation)."""
    from ..operators.algorithms import triangle_count

    return triangle_count(graph.rels).select(
        F.col("id").alias("node"), "triangles")


@procedure("algo.nodesimilarity")
def algo_node_similarity(spark, graph, args):
    """(relType?, minSimilarity?) -> (a, b, intersection, similarity) —
    Jaccard over out-neighbor sets; candidate pairs via the shared-
    neighbor wedge join (co-occurrence, never n^2)."""
    from ..operators.algorithms import node_similarity

    rels = graph.rels_for_types([args[0]]) if args else graph.rels
    min_sim = float(args[1]) if len(args) > 1 else 0.0
    return node_similarity(rels, min_sim)


@procedure("algo.allpaths")
def algo_all_paths(spark, graph, args):
    """(sourceId, targetId, maxDepth, directed?) -> (nodeIds, relIds,
    length): all trails between two nodes up to maxDepth
    (GraphAlgoFactory.allPaths, graph-algo/.../path/AllPaths.java:42 —
    RELATIONSHIP_PATH uniqueness)."""
    from ..operators.algorithms import all_paths

    directed = bool(args[3]) if len(args) > 3 else True
    return all_paths(graph.rels, int(args[0]), int(args[1]),
                     int(args[2]), directed=directed, node_unique=False)


@procedure("algo.allsimplepaths")
def algo_all_simple_paths(spark, graph, args):
    """(sourceId, targetId, maxDepth, directed?) -> (nodeIds, relIds,
    length): all simple (node-unique) paths up to maxDepth
    (GraphAlgoFactory.allSimplePaths, AllSimplePaths.java:32 — NODE_PATH
    uniqueness)."""
    from ..operators.algorithms import all_paths

    directed = bool(args[3]) if len(args) > 3 else True
    return all_paths(graph.rels, int(args[0]), int(args[1]),
                     int(args[2]), directed=directed, node_unique=True)


@procedure("algo.kshortestpaths")
def algo_k_shortest_paths(spark, graph, args):
    """(sourceId, targetId, k, weightProp?, directed?, maxDepth?) ->
    (nodeIds, relIds, cost): the k cheapest simple paths (Dijkstra with
    PathInterestFactory.numberOfShortest(k), drained via
    TopFetchingWeightedPathIterator — graph-algo/.../Dijkstra.java).
    Raises instead of truncating when maxDepth is reached with the k-th
    path unconfirmed."""
    from ..operators.algorithms import k_shortest_paths

    weight = str(args[3]) if len(args) > 3 and args[3] is not None else None
    directed = bool(args[4]) if len(args) > 4 else True
    max_depth = int(args[5]) if len(args) > 5 else 15
    return k_shortest_paths(graph.rels, int(args[0]), int(args[1]),
                            int(args[2]), weight_col=weight,
                            directed=directed, max_depth=max_depth)


@procedure("algo.exactdepthpaths")
def algo_exact_depth_paths(spark, graph, args):
    """(sourceId, targetId, depth, directed?) -> (nodeIds, relIds,
    length): node-unique paths of EXACTLY the given length
    (GraphAlgoFactory.pathsWithLength, ExactDepthPathFinder.java:55 with
    allowLoops=false => NODE_PATH uniqueness)."""
    from ..operators.algorithms import all_paths

    depth = int(args[2])
    directed = bool(args[3]) if len(args) > 3 else True
    out = all_paths(graph.rels, int(args[0]), int(args[1]), depth,
                    directed=directed, node_unique=True)
    return out.filter(F.col("length") == depth)


# ---- vector index analog (db.index.vector.queryNodes) ---------------------


@procedure("db.index.vector.createnodeindex")
def vector_create_node_index(spark, graph, args):
    """(name, label, propertyKey, dimensions?, similarityFunction?) —
    VectorIndexProcedures.createNodeIndex:105.  Records catalog metadata;
    queries stay exact brute-force (correct at any recall), with the
    partition-pruned IVF layout available via ml.similarity.save_ivf_index
    for the approximate 100 TB path."""
    name = str(args[0])
    label = str(args[1]) if len(args) > 1 else None
    prop = str(args[2]) if len(args) > 2 else "embedding"
    dims = int(args[3]) if len(args) > 3 and args[3] is not None else None
    sim = str(args[4]) if len(args) > 4 and args[4] is not None else "cosine"
    if not hasattr(graph, "schema_indexes"):
        graph.schema_indexes = {}
    graph.schema_indexes[name] = {
        "name": name, "type": "VECTOR", "entityType": "NODE",
        "labelsOrTypes": [label] if label else [], "properties": [prop],
        "options": {"dimensions": dims, "similarity": sim}}
    return spark.createDataFrame(
        [(name, label, prop, dims, sim)],
        "name string, label string, property string, dimensions int, "
        "similarityFunction string")


@procedure("db.index.vector.querynodes")
def vector_query_nodes(spark, graph, args):
    """(propertyKey, k, queryVector) -> node id + score, brute-force cosine.

    Exact top-k over all nodes carrying the embedding property; the
    scalable path (LSH-bucketed ANN) lives in neo4j_spark.ml.similarity.
    """
    prop, k, qvec = args[0], int(args[1]), list(args[2])
    nodes = graph.nodes
    if prop not in nodes.columns:
        raise ProcedureError(f"no node property {prop}")
    q = F.lit(qvec)
    emb = F.col(prop)
    dot = F.aggregate(F.zip_with(emb, q, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(q, F.lit(0.0), lambda acc, x: acc + x * x))
    score = (F.lit(1.0) + dot / (na * nb)) / F.lit(2.0)
    scored = nodes.filter(emb.isNotNull()).select(
        F.col("id").alias("node"), score.alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col("node")).limit(k)


# ---- fulltext index analog (db.index.fulltext.queryNodes) -----------------


# Lucene BM25Similarity defaults (the reference's fulltext scoring,
# FulltextProcedures.java:120 -> Lucene 9 BM25): idf = ln(1 + (N - df +
# 0.5) / (df + 0.5)); tfNorm = tf / (tf + k1 * (1 - b + b * dl / avgdl));
# score = sum over query terms of idf * tfNorm.  (Lucene >= 8 dropped the
# (k1 + 1) numerator factor; dl here is exact, not SmallFloat-encoded.)
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_score(tf: F.Column, dl: F.Column, df_t: F.Column,
                n_docs: F.Column, avgdl: F.Column) -> F.Column:
    idf = F.log(F.lit(1.0) + (n_docs - df_t + F.lit(0.5))
                / (df_t + F.lit(0.5)))
    norm = tf.cast("double") / (
        tf + F.lit(_BM25_K1) * (F.lit(1.0 - _BM25_B)
                                + F.lit(_BM25_B) * dl / avgdl))
    return idf * norm


# ---- analyzers ------------------------------------------------------------
#
# The reference exposes configurable Lucene analyzers per fulltext index
# (createNodeIndex config {analyzer: ...}; the catalog is listed by
# db.index.fulltext.listAvailableAnalyzers — community/fulltext-index/
# .../analyzer provider SPI).  Implemented here as paired column-side /
# driver-side tokenizers (both sides MUST agree: documents tokenize in
# the scan, query strings tokenize on the driver).  'english' uses the
# published S-stemmer (Harman 1991, "How Effective Is Suffixing?") —
# a deterministic plural stemmer — rather than full Porter.

# Lucene's ENGLISH_STOP_WORDS_SET (EnglishAnalyzer.java — public)
_ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with"
    .split())

_ANALYZERS = {
    "standard-no-stop-words":
        "lowercase, split on non-word characters (the default)",
    "standard": "lowercase, split, English stop words removed",
    "english": "standard + S-stemmer plural stemming (Harman 1991)",
    "simple": "lowercase, split on non-letters",
    "whitespace": "split on whitespace, case preserved",
    "keyword": "the whole value as a single token",
}


def _s_stem_py(w: str) -> str:
    if w.endswith("ies") and not (w.endswith("eies") or w.endswith("aies")):
        return w[:-3] + "y"
    if w.endswith("es") and not (w.endswith("aes") or w.endswith("ees")
                                 or w.endswith("oes")):
        return w[:-1]
    if w.endswith("s") and not (w.endswith("us") or w.endswith("ss")):
        return w[:-1]
    return w


def _s_stem_col(x: F.Column) -> F.Column:
    return (F.when(x.rlike("(?<![ea])ies$"),
                   F.regexp_replace(x, "ies$", "y"))
             .when(x.rlike("(?<![aeo])es$"), F.regexp_replace(x, "s$", ""))
             .when(x.rlike("(?<![us])s$"), F.regexp_replace(x, "s$", ""))
             .otherwise(x))


def _check_analyzer(analyzer: str) -> str:
    analyzer = (analyzer or "standard-no-stop-words").lower()
    if analyzer not in _ANALYZERS:
        raise ProcedureError(
            f"unknown analyzer '{analyzer}' (available: "
            f"{', '.join(sorted(_ANALYZERS))})")
    return analyzer


def _analyze_col(prop_col: F.Column, analyzer: str) -> F.Column:
    """Tokenize a document column under ``analyzer`` -> array<string>."""
    analyzer = _check_analyzer(analyzer)
    if analyzer == "keyword":
        return F.array(prop_col)
    if analyzer == "whitespace":
        toks = F.split(prop_col, r"\s+")
    elif analyzer == "simple":
        toks = F.split(F.lower(prop_col), r"[^a-z]+")
    else:
        toks = F.split(F.lower(prop_col), r"\W+")
    toks = F.filter(toks, lambda x: x != "")
    if analyzer in ("standard", "english"):
        stops = F.lit(sorted(_ENGLISH_STOP_WORDS))

        def keep(x):
            return ~F.array_contains(stops, x)

        toks = F.filter(toks, keep)
    if analyzer == "english":
        toks = F.transform(toks, _s_stem_col)
    return toks


def _analyze_term_py(word: str, analyzer: str):
    """Driver-side mirror of ``_analyze_col`` for one query term; returns
    None when the analyzer drops the term (stop word / empty)."""
    analyzer = _check_analyzer(analyzer)
    if analyzer == "keyword":
        return word
    if analyzer == "whitespace":
        return word or None
    word = word.lower()
    if analyzer == "simple":
        word = re.sub(r"[^a-z]+", "", word)
    else:
        word = re.sub(r"\W+", "", word)
    if not word:
        return None
    if analyzer in ("standard", "english") and word in _ENGLISH_STOP_WORDS:
        return None
    if analyzer == "english":
        word = _s_stem_py(word)
    return word


def _analyze_query_py(query: str, analyzer: str):
    if _check_analyzer(analyzer) == "keyword":
        return [query]
    out = []
    for w in re.split(r"\s+", query):
        t = _analyze_term_py(w, analyzer)
        if t is not None:
            out.append(t)
    return out


def _bm25_scan(frame, id_col: str, prop: str, terms, out_name: str,
               analyzer: str = "standard-no-stop-words"):
    """BM25 over a tokenized property scan: ONE global aggregate (N,
    avgdl, per-term document frequencies — all over the same rowstream,
    so splitting them would tokenize the corpus an extra time), its
    1-row frame broadcast-crossJoined into the scoring scan — no driver
    collects."""
    toks = _analyze_col(F.col(prop), analyzer)
    docs = frame.filter(F.col(prop).isNotNull()).select(
        F.col(id_col).alias(out_name), toks.alias("__toks"))
    docs = docs.withColumn("__dl", F.size("__toks"))
    def _tf(term):
        # NB: a two-arg lambda would make F.filter pass (element, index)
        return F.size(F.filter(F.col("__toks"),
                               lambda x: x == F.lit(term)))

    tf_cols, df_aggs = [], []
    for i, t in enumerate(terms):
        tf_cols.append(_tf(t).alias(f"__tf{i}"))
        df_aggs.append(F.sum(F.when(F.col(f"__tf{i}") > 0, 1)
                             .otherwise(0)).alias(f"__df{i}"))
    scored = docs.select(out_name, "__dl", *tf_cols)
    glob = scored.agg(F.count(F.lit(1)).alias("__n"),
                      F.avg("__dl").alias("__avgdl"), *df_aggs)
    scored = scored.crossJoin(F.broadcast(glob))
    score = None
    for i in range(len(terms)):
        s = _bm25_score(F.col(f"__tf{i}"), F.col("__dl"),
                        F.col(f"__df{i}"), F.col("__n"), F.col("__avgdl"))
        score = s if score is None else score + s
    any_tf = None
    for i in range(len(terms)):
        c = F.col(f"__tf{i}") > 0
        any_tf = c if any_tf is None else (any_tf | c)
    return (scored.filter(any_tf)
            .select(out_name, score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(out_name)))


# ---- Lucene query syntax (the common subset) ------------------------------
#
# The reference hands the query string to Lucene's parser
# (FulltextProcedures.java:120 -> QueryParser).  Supported here: bare
# terms (implicit OR, Lucene's default operator), "quoted phrases",
# AND / OR / NOT (also && / || / !), +must / -must_not modifiers,
# parentheses, field prefixes (must name the indexed property),
# fuzzy term~N (Levenshtein, default 2), wildcards te?t / te*t,
# term ranges [a TO b] / {a TO b} (mixed brackets, * endpoints), and
# boosts term^2 / "phrase"^2, and sloppy phrases "..."~N
# (SloppyPhraseMatcher window semantics: one occurrence per word with
# max(pos_i - i) - min(pos_i - i) <= N; repeated terms in a sloppy
# phrase raise).  Scoring: BM25 x boost summed over the matching
# POSITIVE clauses (must_not never scores); wildcard and range clauses
# are CONSTANT-score (= boost), matching Lucene's MultiTermQuery
# constant-score rewrite; phrase tf = exact consecutive-token
# occurrences (slop > 0: anchored sloppy-window count), fuzzy tf =
# tokens within edit distance.


def _lucene_lex(q: str):
    toks, i, n = [], 0, len(q)
    _clause_start = True
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            _clause_start = True
            continue
        if c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ProcedureError("unterminated phrase in Lucene query")
            slop = 0
            i2 = j + 1
            if i2 < n and q[i2] == "~":
                # sloppy phrase "..."~N (QueryParser: slop before boost);
                # Lucene truncates a fractional slop to int
                m = re.match(r"~(\d+)", q[i2:])
                if not m:
                    raise ProcedureError("bad phrase slop in Lucene query")
                slop = int(m.group(1))
                i2 += m.end()
            boost = 1.0
            if i2 < n and q[i2] == "^":
                m = re.match(r"\^(\d+(?:\.\d+)?)", q[i2:])
                if not m:
                    raise ProcedureError("bad boost in Lucene query")
                boost = float(m.group(1))
                i2 += m.end()
            toks.append(("phrase", q[i + 1:j], boost, slop))
            i = i2
        elif c == "(":
            toks.append(("lp",)); i += 1; _clause_start = True
        elif c == ")":
            toks.append(("rp",)); i += 1
        elif c == "+" and _clause_start:
            toks.append(("plus",)); i += 1
        elif c == "-" and _clause_start:
            toks.append(("minus",)); i += 1
        elif c == "!":
            toks.append(("not",)); i += 1
        elif q.startswith("&&", i):
            toks.append(("and",)); i += 2
        elif q.startswith("||", i):
            toks.append(("or",)); i += 2
        else:
            st = i
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()"':
                j += 1
            w = q[i:j]
            i = j
            if w == "AND":
                toks.append(("and",))
            elif w == "OR":
                toks.append(("or",))
            elif w == "NOT":
                toks.append(("not",))
            else:
                field = None
                if ":" in w and w[:1] not in "[{":
                    field, w = w.split(":", 1)
                if w[:1] in "[{":
                    # term range [a TO b] / {a TO b}: contains spaces —
                    # rescan from the opening bracket to the closing one
                    bs = st + (len(field) + 1 if field is not None else 0)
                    m = re.search(r"[\]}]", q[bs:])
                    if not m:
                        raise ProcedureError(
                            "unterminated range in Lucene query")
                    rng = q[bs:bs + m.end()]
                    i = bs + m.end()
                    boost = 1.0
                    if i < n and q[i] == "^":
                        mb = re.match(r"\^(\d+(?:\.\d+)?)", q[i:])
                        if not mb:
                            raise ProcedureError(
                                "bad boost in Lucene query")
                        boost = float(mb.group(1))
                        i += mb.end()
                    parts = re.split(r"\s+TO\s+", rng[1:-1].strip())
                    if len(parts) != 2:
                        raise ProcedureError(
                            f"bad range syntax in Lucene query: {rng}")
                    lo = None if parts[0] == "*" else parts[0].lower()
                    hi = None if parts[1] == "*" else parts[1].lower()
                    toks.append(("rangeq", lo, hi, rng[0] == "[",
                                 rng[-1] == "]", field, boost))
                else:
                    boost = 1.0
                    mb = re.search(r"\^(\d+(?:\.\d+)?)$", w)
                    if mb:
                        boost = float(mb.group(1))
                        w = w[:mb.start()]
                    fuzz = None
                    if "~" in w:
                        w, _, fz = w.partition("~")
                        try:
                            fuzz = int(fz) if fz else 2
                        except ValueError:
                            raise ProcedureError(
                                f"bad fuzzy distance in Lucene query: {fz}")
                    if any(ch in w for ch in "[]{}^"):
                        raise ProcedureError(
                            f"unsupported Lucene syntax: {w}")
                    if "*" in w or "?" in w:
                        if fuzz is not None:
                            raise ProcedureError(
                                "cannot combine wildcard and fuzzy in "
                                "one Lucene term")
                        toks.append(("wildq", w.lower(), field, boost))
                    else:
                        toks.append(
                            ("term", w.lower(), field, fuzz, boost))
        _clause_start = toks[-1][0] in ("lp", "and", "or", "not",
                                        "plus", "minus")
    return toks


def _lucene_parse(q: str, prop: str):
    """Parse a Lucene query into ('bool', musts, nots, shoulds) /
    ('and', kids) / ('not', kid) / leaf nodes; leaves carry a trailing
    boost: ('term', w, b) / ('fuzzy', w, n, b) / ('phrase', [w...], slop, b) /
    ('wild', pat, b) / ('range', lo, hi, inc_lo, inc_hi, b)."""
    tokens = _lucene_lex(q)
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else None

    def take():
        t = tokens[pos[0]]
        pos[0] += 1
        return t

    def parse_primary():
        t = peek()
        if t is None:
            raise ProcedureError("unexpected end of Lucene query")
        if t[0] == "lp":
            take()
            node = parse_or()
            if peek() is None or peek()[0] != "rp":
                raise ProcedureError("unbalanced ( in Lucene query")
            take()
            return node
        def ck_field(field):
            if field is not None and field != prop:
                raise ProcedureError(
                    f"field '{field}:' does not match the indexed "
                    f"property '{prop}'")

        if t[0] == "phrase":
            take()
            _, body, boost, slop = t
            words = [w for w in re.split(r"\W+", body.lower()) if w]
            if not words:
                raise ProcedureError("empty phrase in Lucene query")
            return ("term", words[0], boost) if len(words) == 1 \
                else ("phrase", words, slop, boost)
        if t[0] == "term":
            take()
            _, w, field, fuzz, boost = t
            ck_field(field)
            if not w:
                raise ProcedureError("empty term in Lucene query")
            return ("fuzzy", w, fuzz, boost) if fuzz \
                else ("term", w, boost)
        if t[0] == "wildq":
            take()
            _, w, field, boost = t
            ck_field(field)
            return ("wild", w, boost)
        if t[0] == "rangeq":
            take()
            _, lo, hi, il, ih, field, boost = t
            ck_field(field)
            return ("range", lo, hi, il, ih, boost)
        raise ProcedureError(f"unexpected token in Lucene query: {t[0]}")

    def parse_mod():
        t = peek()
        if t is not None and t[0] in ("not", "minus"):
            take()
            return ("not", parse_mod())
        if t is not None and t[0] == "plus":
            take()
            return ("must", parse_mod())
        return parse_primary()

    def parse_and():
        kids = [parse_mod()]
        while peek() is not None and peek()[0] == "and":
            take()
            kids.append(parse_mod())
        if len(kids) == 1:
            return kids[0]
        return ("and", [k[1] if k[0] == "must" else k for k in kids])

    def parse_or():
        kids = [parse_and()]
        while peek() is not None and peek()[0] in (
                "or", "phrase", "term", "wildq", "rangeq",
                "plus", "minus", "not", "lp"):
            if peek()[0] == "or":
                take()
            kids.append(parse_and())
        if len(kids) == 1 and kids[0][0] not in ("must", "not"):
            return kids[0]
        # BooleanQuery semantics: with MUST clauses present, SHOULD
        # clauses are optional (scoring only); without, one must match
        musts = [k[1] for k in kids if k[0] == "must"]
        nots = [k[1] for k in kids if k[0] == "not"]
        shoulds = [k for k in kids if k[0] not in ("must", "not")]
        return ("bool", musts, nots, shoulds)

    node = parse_or()
    if peek() is not None:
        raise ProcedureError("unbalanced ) in Lucene query")
    return node


def _is_lucene_syntax(q: str) -> bool:
    if any(ch in q for ch in '"():+~&|!*?[]{}^'):
        return True
    return bool(re.search(r"\b(AND|OR|NOT)\b", q))


def _analyze_lucene_tree(nd, analyzer: str):
    """Run the index's analyzer over the parsed query tree's terms
    (Lucene analyzes query terms with the field's analyzer).  Dropped
    terms (stop words) remove their clause, as Lucene's parser does;
    fuzzy terms are lowercased but never stemmed."""
    kind = nd[0]
    if kind == "term":
        t = _analyze_term_py(nd[1], analyzer)
        return None if t is None else ("term", t, nd[2])
    if kind == "fuzzy":
        return ("fuzzy", nd[1].lower(), nd[2], nd[3])
    if kind in ("wild", "range"):
        # Lucene multi-term queries are lowercased but never
        # stemmed/stop-filtered by the analyzer
        return nd
    if kind == "phrase":
        words = [w for w in (_analyze_term_py(x, analyzer)
                             for x in nd[1]) if w is not None]
        if not words:
            return None
        return ("term", words[0], nd[3]) if len(words) == 1 \
            else ("phrase", words, nd[2], nd[3])
    if kind == "not":
        ch = _analyze_lucene_tree(nd[1], analyzer)
        return None if ch is None else ("not", ch)
    if kind == "and":
        kids = [k for k in (_analyze_lucene_tree(x, analyzer)
                            for x in nd[1]) if k is not None]
        if not kids:
            return None
        return kids[0] if len(kids) == 1 else ("and", kids)
    if kind == "bool":
        musts = [k for k in (_analyze_lucene_tree(x, analyzer)
                             for x in nd[1]) if k is not None]
        nots = [k for k in (_analyze_lucene_tree(x, analyzer)
                            for x in nd[2]) if k is not None]
        shoulds = [k for k in (_analyze_lucene_tree(x, analyzer)
                               for x in nd[3]) if k is not None]
        if not (musts or nots or shoulds):
            return None
        return ("bool", musts, nots, shoulds)
    return nd


def _lucene_scan(frame, id_col: str, prop: str, node, out_name: str,
                 analyzer: str = "standard-no-stop-words"):
    """Evaluate a parsed Lucene query over a tokenized property scan:
    per-leaf tf columns (term equality / Levenshtein / consecutive-token
    phrase count), per-leaf df aggregates broadcast back, BM25 summed
    over matching positive leaves, boolean tree as the match filter."""
    node = _analyze_lucene_tree(node, analyzer)
    if node is None:
        # every clause analyzed away (all stop words): no matches
        return frame.sparkSession.createDataFrame(
            [], f"{out_name} bigint, score double")
    leaves = []   # (node, scoring)

    def collect(nd, scoring=True):
        kind = nd[0]
        if kind in ("term", "fuzzy", "phrase", "wild", "range"):
            for i, (l, s) in enumerate(leaves):
                if l == nd:
                    if scoring and not s:
                        leaves[i] = (l, True)
                    return
            leaves.append((nd, scoring))
        elif kind == "not":
            collect(nd[1], False)
        elif kind == "and":
            for k in nd[1]:
                collect(k, scoring)
        elif kind == "bool":
            for k in nd[1]:
                collect(k, scoring)
            for k in nd[2]:
                collect(k, False)
            for k in nd[3]:
                collect(k, scoring)

    collect(node)

    toks = _analyze_col(F.col(prop), analyzer)
    docs = frame.filter(F.col(prop).isNotNull()).select(
        F.col(id_col).alias(out_name), toks.alias("__toks"))
    docs = docs.withColumn("__dl", F.size("__toks"))

    def leaf_tf(nd):
        if nd[0] == "term":
            return F.size(F.filter(F.col("__toks"),
                                   lambda x: x == F.lit(nd[1])))
        if nd[0] == "fuzzy":
            w, dist = nd[1], nd[2]
            return F.size(F.filter(
                F.col("__toks"),
                lambda x: F.levenshtein(x, F.lit(w)) <= F.lit(dist)))
        if nd[0] == "wild":
            pat = "^" + "".join(
                ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                for ch in nd[1]) + "$"
            return F.size(F.filter(F.col("__toks"),
                                   lambda x: x.rlike(pat)))
        if nd[0] == "range":
            _, lo, hi, il, ih, _b = nd

            def in_range(x):
                c = F.lit(True)
                if lo is not None:
                    c = c & ((x >= lo) if il else (x > lo))
                if hi is not None:
                    c = c & ((x <= hi) if ih else (x < hi))
                return c

            return F.size(F.filter(F.col("__toks"), in_range))
        words = nd[1]
        k = len(words)
        slop = nd[2] if len(nd) > 3 else 0
        if slop > 0:
            # sloppy phrase (SloppyPhraseMatcher): with adjusted
            # positions q_i = p_i - i, the phrase matches iff some
            # selection of one occurrence per word has
            # max(q) - min(q) <= slop.  Equivalently: exists a base b
            # with every word's q in [b, b + slop]; it suffices to try
            # b in [q1 - slop, q1] for each anchor occurrence q1 of the
            # first word (any valid selection's min serves as b).
            # tf = anchored match count (drives BM25; match = tf > 0).
            if len(set(words)) != len(words):
                raise ProcedureError(
                    "sloppy phrases with repeated terms are not "
                    "supported (distinct-position matching)")
            idxs = F.when(F.col("__dl") == 0,
                          F.array().cast("array<int>")) \
                .otherwise(F.sequence(F.lit(0), F.col("__dl") - 1))

            def qpos(i):
                # adjusted positions of word i
                return F.transform(
                    F.filter(idxs, lambda j: F.element_at(
                        F.col("__toks"), j + 1) == F.lit(words[i])),
                    lambda j: j - F.lit(i))

            from ..functions.let import let

            def with_qs(qs_flat):
                # qs_flat: array of k structs is awkward — bind each
                def q_of(i):
                    return F.element_at(qs_flat, i + 1)

                def ok_base(b):
                    cond = F.lit(True)
                    for i in range(1, k):
                        cond = cond & F.exists(
                            q_of(i), lambda q: (q >= b) & (q <= b + slop))
                    return cond

                return F.size(F.filter(
                    q_of(0),
                    lambda q1: F.exists(
                        F.sequence(q1 - slop, q1), ok_base)))

            return let(F.array(*[qpos(i) for i in range(k)]), with_qs)

        starts = F.when(F.col("__dl") < k, F.array().cast("array<int>")) \
            .otherwise(F.sequence(F.lit(0), F.col("__dl") - k))

        def at(i, j):
            return F.element_at(F.col("__toks"), i + j + 1)

        def match_at(i):
            cond = at(i, 0) == F.lit(words[0])
            for j in range(1, k):
                cond = cond & (at(i, j) == F.lit(words[j]))
            return cond

        return F.size(F.filter(starts, match_at))

    tf_cols = [leaf_tf(nd).alias(f"__tf{i}")
               for i, (nd, _) in enumerate(leaves)]
    scored = docs.select(out_name, "__dl", *tf_cols)
    df_aggs = [F.sum(F.when(F.col(f"__tf{i}") > 0, 1).otherwise(0))
               .alias(f"__df{i}") for i in range(len(leaves))]
    # ONE global aggregate for N/avgdl/df — a separate stats pass over
    # ``docs`` would re-tokenize the whole corpus a third time
    glob = scored.agg(F.count(F.lit(1)).alias("__n"),
                      F.avg("__dl").alias("__avgdl"), *df_aggs)
    scored = scored.crossJoin(F.broadcast(glob))

    def hit(nd):
        for i, (l, _) in enumerate(leaves):
            if l == nd:
                return F.col(f"__tf{i}") > 0
        raise ProcedureError("internal: unknown Lucene leaf")

    def matches(nd):
        kind = nd[0]
        if kind in ("term", "fuzzy", "phrase", "wild", "range"):
            return hit(nd)
        if kind == "not":
            return ~matches(nd[1])
        if kind == "and":
            out = None
            for k in nd[1]:
                c = matches(k)
                out = c if out is None else out & c
            return out
        if kind == "bool":
            musts, nots, shoulds = nd[1], nd[2], nd[3]
            out = None
            for k in musts:
                c = matches(k)
                out = c if out is None else out & c
            for k in nots:
                c = ~matches(k)
                out = c if out is None else out & c
            if shoulds and not musts:
                sh = None
                for k in shoulds:
                    c = matches(k)
                    sh = c if sh is None else sh | c
                out = sh if out is None else out & sh
            return out if out is not None else F.lit(False)
        raise ProcedureError(f"internal: unknown Lucene node {kind}")

    score = None
    for i, (nd, scoring) in enumerate(leaves):
        if not scoring:
            continue
        boost = float(nd[-1])
        if nd[0] in ("wild", "range"):
            # Lucene MultiTermQuery constant-score rewrite: a matching
            # wildcard/range clause contributes its boost, not BM25
            s = F.when(F.col(f"__tf{i}") > 0,
                       F.lit(boost)).otherwise(F.lit(0.0))
        else:
            s = F.when(
                F.col(f"__tf{i}") > 0,
                _bm25_score(F.col(f"__tf{i}"), F.col("__dl"),
                            F.col(f"__df{i}"), F.col("__n"),
                            F.col("__avgdl"))
                * F.lit(boost)).otherwise(F.lit(0.0))
        score = s if score is None else score + s
    if score is None:
        score = F.lit(0.0)
    return (scored.filter(matches(node))
            .select(out_name, score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(out_name)))


@procedure("db.index.fulltext.createnodeindex")
def fulltext_create_node_index(spark, graph, args):
    """(indexName, [labels], [properties]) — materialize an inverted-index
    parquet table (FulltextProcedures analog of CREATE FULLTEXT INDEX).

    Layout: postings (term, node, tf, dl) repartitioned + sorted by term,
    so a term filter prunes parquet row groups — at 100 TB a query touches
    only the row groups whose [min,max] term range covers its terms, never
    the corpus — plus a 1-row corpus-stats table (N, avgdl) for BM25.
    The index root comes from ``neo4j_spark.fulltext.indexDir`` (a shared
    warehouse path on a real cluster); tempdir is only the local-mode
    default.  Scoring matches the scan fallback exactly."""
    import tempfile

    name = str(args[0])
    labels = list(args[1]) if len(args) > 1 and args[1] else []
    props = list(args[2]) if len(args) > 2 and args[2] else []
    config = dict(args[3]) if len(args) > 3 and args[3] else {}
    analyzer = _check_analyzer(str(config.get(
        "analyzer", "standard-no-stop-words")))
    prop = props[0] if props else name
    nodes = graph.nodes
    if labels:
        src = None
        for l in labels:
            f = graph.node_frames.get(l)
            if f is not None:
                src = f if src is None else src.unionByName(
                    f, allowMissingColumns=True)
        nodes = src if src is not None else nodes
    if prop not in nodes.columns:
        raise ProcedureError(f"no node property {prop}")
    toks = _analyze_col(F.col(prop), analyzer)
    docs = (nodes.filter(F.col(prop).isNotNull())
            .select(F.col("id").alias("node"), toks.alias("__toks"))
            .withColumn("dl", F.size("__toks")))
    inv = (docs.select("node", "dl", F.explode("__toks").alias("term"))
           .groupBy("term", "node", "dl")
           .agg(F.count(F.lit(1)).alias("tf")))
    base = spark.conf.get("neo4j_spark.fulltext.indexDir",
                          tempfile.gettempdir())
    path = f"{base}/neo4j_spark_ft_{name}_{id(graph)}"
    inv.repartition("term").sortWithinPartitions("term") \
       .write.mode("overwrite").parquet(f"{path}/postings")
    docs.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")) \
        .write.mode("overwrite").parquet(f"{path}/stats")
    entry = {"path": path, "prop": prop, "analyzer": analyzer}
    graph.fulltext_indexes[name] = entry
    graph.fulltext_indexes[prop] = entry
    return spark.createDataFrame([(name, prop)], "name string, property string")


@procedure("db.index.fulltext.listavailableanalyzers")
def fulltext_list_analyzers(spark, graph, args):
    """() -> (analyzer, description) rows
    (FulltextProcedures.java listAvailableAnalyzers)."""
    return spark.createDataFrame(
        sorted(_ANALYZERS.items()), "analyzer string, description string")


@procedure("db.index.fulltext.querynodes")
def fulltext_query_nodes(spark, graph, args):
    """(indexNameOrProperty, query) -> node id + BM25 score
    (FulltextProcedures.java:120; Lucene BM25Similarity defaults).

    Uses the materialized inverted index when one was created (term filter
    pushed into its parquet scan; df per term aggregated from the touched
    postings, N/avgdl from the 1-row stats table); otherwise a single-pass
    scan.  Both paths score identically."""
    prop, query = args[0], str(args[1])
    idx0 = graph.fulltext_indexes.get(prop)
    analyzer = (idx0 or {}).get("analyzer", "standard-no-stop-words")
    if _is_lucene_syntax(query):
        # Lucene operators need per-document token positions (phrases) or
        # boolean context — evaluated on the single-pass scan; the
        # postings layout carries no positions (documented trade-off)
        real_prop = idx0["prop"] if idx0 is not None else prop
        nodes = graph.nodes
        if real_prop not in nodes.columns:
            raise ProcedureError(f"no node property {real_prop}")
        node = _lucene_parse(query, real_prop)
        return _lucene_scan(nodes, "id", real_prop, node, "node",
                            analyzer=analyzer)
    terms = _analyze_query_py(query, analyzer)
    idx = idx0
    if idx is not None:
        inv = spark.read.parquet(f"{idx['path']}/postings") \
            .filter(F.col("term").isin(terms))
        stats = spark.read.parquet(f"{idx['path']}/stats")
        dfreq = inv.groupBy("term").agg(
            F.count(F.lit(1)).alias("__df"))
        scored = (inv.join(F.broadcast(dfreq), "term")
                  .crossJoin(F.broadcast(stats))
                  .select("node",
                          _bm25_score(F.col("tf"), F.col("dl"),
                                      F.col("__df"), F.col("n"),
                                      F.col("avgdl")).alias("__s")))
        return (scored.groupBy("node")
                .agg(F.sum("__s").alias("score"))
                .orderBy(F.col("score").desc(), F.col("node")))
    nodes = graph.nodes
    if prop not in nodes.columns:
        raise ProcedureError(f"no node property {prop}")
    return _bm25_scan(nodes, "id", prop, terms, "node", analyzer=analyzer)


@procedure("db.index.vector.queryrelationships")
def vector_query_relationships(spark, graph, args):
    """(propertyKey, k, queryVector) -> relationship id + score
    (VectorIndexProcedures.java:164) — brute-force cosine over rels
    carrying the embedding property."""
    prop, k, qvec = args[0], int(args[1]), list(args[2])
    rels = graph.rels
    if prop not in rels.columns:
        raise ProcedureError(f"no relationship property {prop}")
    q = F.lit(qvec)
    emb = F.col(prop)
    dot = F.aggregate(F.zip_with(emb, q, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(q, F.lit(0.0), lambda acc, x: acc + x * x))
    scored = rels.filter(emb.isNotNull()).select(
        F.col("id").alias("relationship"),
        ((F.lit(1.0) + dot / (na * nb)) / F.lit(2.0)).alias("score"))
    return scored.orderBy(F.col("score").desc(),
                          F.col("relationship")).limit(k)


@procedure("db.index.fulltext.queryrelationships")
def fulltext_query_relationships(spark, graph, args):
    """(propertyKey, query) -> relationship id + BM25 score
    (FulltextProcedures.java:202), same scan-based scoring as the node
    variant."""
    prop, query = args[0], str(args[1])
    rels = graph.rels
    if prop not in rels.columns:
        raise ProcedureError(f"no relationship property {prop}")
    if _is_lucene_syntax(query):
        node = _lucene_parse(query, prop)
        return _lucene_scan(rels, "id", prop, node, "relationship")
    terms = _analyze_query_py(query, "standard-no-stop-words")
    return _bm25_scan(rels, "id", prop, terms, "relationship")


@procedure("db.create.setvectorproperty")
@procedure("db.create.setnodevectorproperty")
@procedure("db.index.vector.setnodevectorproperty")
def set_node_vector_property(spark, graph, args):
    """(nodeId, propertyKey, vector) -> () (VectorIndexProcedures.java:197,
    current names db.create.setNodeVectorProperty / legacy aliases):
    batch property rewrite of the owning label shard."""
    node_id, prop, vec = int(args[0]), str(args[1]), list(args[2])
    lit_vec = F.array(*[F.lit(float(x)) for x in vec])
    for lbl, frame in list(graph.node_frames.items()):
        if prop in frame.columns:
            newcol = F.when(F.col("id") == node_id, lit_vec) \
                      .otherwise(F.col(prop))
        else:
            newcol = F.when(F.col("id") == node_id, lit_vec)
        graph.node_frames[lbl] = frame.withColumn(prop, newcol)
    return spark.createDataFrame([], "node bigint")


@procedure("db.create.setrelationshipvectorproperty")
def set_rel_vector_property(spark, graph, args):
    """(relId, propertyKey, vector) -> ()
    (db.create.setRelationshipVectorProperty): rel-shard analog of the
    node setter."""
    rel_id, prop, vec = int(args[0]), str(args[1]), list(args[2])
    lit_vec = F.array(*[F.lit(float(x)) for x in vec])
    for t, frame in list(graph.rel_frames.items()):
        if prop in frame.columns:
            newcol = F.when(F.col("id") == rel_id, lit_vec) \
                      .otherwise(F.col(prop))
        else:
            newcol = F.when(F.col("id") == rel_id, lit_vec)
        graph.rel_frames[t] = frame.withColumn(prop, newcol)
    return spark.createDataFrame([], "relationship bigint")


@procedure("db.awaitindex")
@procedure("db.awaitindexes")
def db_await_indexes(spark, graph, args):
    """No-op: there are no async index builds — scans + parquet stats play
    the index role (BuiltInProcedures.java db.awaitIndex)."""
    return spark.createDataFrame([], "success boolean")


@procedure("db.index.fulltext.awaiteventuallyconsistentindexrefresh")
def db_fulltext_await_refresh(spark, graph, args):
    """No-op: fulltext indexes here are parquet snapshots, always consistent
    with the graph epoch that built them (FulltextProcedures.java)."""
    return spark.createDataFrame([], "success boolean")


@procedure("db.clearquerycaches")
def db_clear_query_caches(spark, graph, args):
    """Clears the engine-side memo caches (count store / catalog memos) —
    the batch analog of BuiltInDbmsProcedures db.clearQueryCaches."""
    n = len(graph._count_memo)
    graph._count_memo = {}
    return spark.createDataFrame(
        [(f"Query caches successfully cleared of {n} queries.",)],
        "value string")


@procedure("db.prepareforreplanning")
def db_prepare_for_replanning(spark, graph, args):
    """No-op (db.prepareForReplanning): Catalyst/AQE replan per action;
    there is no statistics-staleness state to reset."""
    return spark.createDataFrame([], "success boolean")


@procedure("db.createlabel")
def db_create_label(spark, graph, args):
    """db.createLabel (BuiltInProcedures.java): create the label token so
    it exists in the catalog before any node uses it."""
    graph._token_labels.add(str(args[0]))
    return spark.createDataFrame([], "success boolean")


@procedure("db.createproperty")
def db_create_property(spark, graph, args):
    """db.createProperty: property-key token creation."""
    graph._token_props.add(str(args[0]))
    return spark.createDataFrame([], "success boolean")


@procedure("db.createrelationshiptype")
def db_create_relationship_type(spark, graph, args):
    """db.createRelationshipType: relationship-type token creation."""
    graph._token_rel_types.add(str(args[0]))
    return spark.createDataFrame([], "success boolean")


@procedure("tx.setmetadata")
def tx_set_metadata(spark, graph, args):
    """tx.setMetaData (TransactionProcedures): attach a metadata map to the
    session; surfaced verbatim by tx.getMetaData."""
    meta = args[0] if args else {}
    if not isinstance(meta, dict):
        raise ProcedureError("tx.setMetaData expects a map argument")
    graph._tx_metadata = dict(meta)
    return spark.createDataFrame([], "success boolean")


@procedure("tx.getmetadata")
def tx_get_metadata(spark, graph, args):
    """tx.getMetaData -> (metadata map). Keys/values stringified: Spark
    map columns are homogeneous, the reference's are AnyValue."""
    meta = {str(k): str(v) for k, v in graph._tx_metadata.items()}
    return spark.createDataFrame([(meta,)], "metadata map<string,string>")


@procedure("dbms.listcapabilities")
def dbms_list_capabilities(spark, graph, args):
    """dbms.listCapabilities -> (name, description) (CapabilitiesService):
    the engine's capability inventory."""
    caps = [
        ("dbms.cypher.version", "Cypher surface implemented by the engine"),
        ("engine.execution", "Spark DataFrame / Catalyst batch execution"),
        ("engine.streaming", "Structured Streaming windows and upserts"),
        ("engine.fulltext", "BM25 fulltext with Lucene-syntax queries"),
        ("engine.vector", "vector similarity + IVF/LSH ANN indexes"),
    ]
    return spark.createDataFrame(caps, "name string, description string")


@procedure("dbms.listconfig")
def dbms_list_config(spark, graph, args):
    """() -> (name, value) rows from the live Spark conf
    (BuiltInDbmsProcedures.java listConfig)."""
    keys = ["spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled",
            "spark.sql.session.timeZone", "spark.master"]
    rows = []
    for k in keys:
        try:
            rows.append((k, str(spark.conf.get(k))))
        except Exception:
            pass
    return spark.createDataFrame(rows, "name string, value string")


# ---- schema / dbms catalog -------------------------------------------------


@procedure("db.schema.visualization")
def db_schema_visualization(spark, graph, args):
    """() -> (nodes, relationships): one row summarizing the schema graph
    (BuiltInProcedures.java db.schema.visualization) — label list + typed
    (srcLabel, type, dstLabel) triples derived from the shard catalog."""
    labels = sorted(graph.labels())
    id2l = None
    for l in labels:
        part = graph.node_frames[l].select("id", F.lit(l).alias("lbl"))
        id2l = part if id2l is None else id2l.unionByName(part)
    edges = None
    for t, rel_df in sorted(graph.rel_frames.items()):
        part = rel_df.select(F.lit(t).alias("t"), "src", "dst")
        edges = part if edges is None else edges.unionByName(part)
    triples = []
    if edges is not None and id2l is not None:
        s_l = id2l.select(F.col("id").alias("src"), F.col("lbl").alias("sl"))
        d_l = id2l.select(F.col("id").alias("dst"), F.col("lbl").alias("dl"))
        rows = (edges.join(s_l, "src").join(d_l, "dst")
                .select("sl", "t", "dl").dropDuplicates().collect())
        triples = sorted((r["sl"], r["t"], r["dl"]) for r in rows)
    return spark.createDataFrame(
        [(labels, [f"(:{s})-[:{t}]->(:{d})" for s, t, d in triples])],
        "nodes array<string>, relationships array<string>")


@procedure("dbms.components")
def dbms_components(spark, graph, args):
    """() -> (name, versions, edition) (BuiltInDbmsProcedures.java)."""
    import pyspark

    return spark.createDataFrame(
        [("neo4j-spark-engine", [pyspark.__version__], "community")],
        "name string, versions array<string>, edition string")


@procedure("db.ping")
def db_ping(spark, graph, args):
    """() -> success (BuiltInProcedures.java db.ping)."""
    return spark.createDataFrame([(True,)], "success boolean")


@procedure("db.info")
def db_info(spark, graph, args):
    """() -> (id, name, creationDate) (BuiltInProcedures.java db.info)."""
    return spark.createDataFrame(
        [("0", "neo4j", None)],
        "id string, name string, creationDate string")


@procedure("dbms.info")
def dbms_info(spark, graph, args):
    """() -> (id, name, creationDate) (BuiltInDbmsProcedures.java)."""
    return spark.createDataFrame(
        [("0", "DBMS", None)],
        "id string, name string, creationDate string")


@procedure("db.resampleindex")
@procedure("db.resampleoutdatedindexes")
def db_resample_index(spark, graph, args):
    """No-op: statistics come from parquet footers / AQE runtime stats
    (IndexProcedures.resampleIndex)."""
    return spark.createDataFrame([], "success boolean")


@procedure("db.schema.nodetypeproperties")
def db_schema_node_type_properties(spark, graph, args):
    """() -> (nodeType, nodeLabels, propertyName, propertyTypes, mandatory)
    derived from the shard catalog schemas
    (BuiltInProcedures.java db.schema.nodeTypeProperties)."""
    rows = []
    for label in sorted(graph.labels()):
        frame = graph.node_frames.get(label)
        if frame is None:
            continue
        for f in frame.schema.fields:
            if f.name in ("id", "labels"):
                continue
            rows.append((f":`{label}`", [label], f.name,
                         [_spark_to_cypher_type(f.dataType)], False))
    return spark.createDataFrame(
        rows, "nodeType string, nodeLabels array<string>, "
              "propertyName string, propertyTypes array<string>, "
              "mandatory boolean")


@procedure("db.schema.reltypeproperties")
def db_schema_rel_type_properties(spark, graph, args):
    """() -> (relType, propertyName, propertyTypes, mandatory)."""
    rows = []
    for t in sorted(graph.rel_frames):
        frame = graph.rel_frames[t]
        props = [f for f in frame.schema.fields
                 if f.name not in ("id", "src", "dst", "type")]
        if not props:
            rows.append((f":`{t}`", None, None, False))
        for f in props:
            rows.append((f":`{t}`", f.name,
                         [_spark_to_cypher_type(f.dataType)], False))
    return spark.createDataFrame(
        rows, "relType string, propertyName string, "
              "propertyTypes array<string>, mandatory boolean")


def _spark_to_cypher_type(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "Long"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "Double"
    if isinstance(dt, T.BooleanType):
        return "Boolean"
    if isinstance(dt, T.StringType):
        return "String"
    if isinstance(dt, T.DateType):
        return "Date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "DateTime"
    if isinstance(dt, T.ArrayType):
        return _spark_to_cypher_type(dt.elementType) + "Array"
    return dt.simpleString()


@procedure("algo.allpairsshortest")
def algo_all_pairs_shortest(spark, graph, args):
    """(relTypes?, weightProp?, directed?) -> (src, dst, dist) — APSP via
    min-plus repeated squaring (FloydWarshall.java parity; FW's O(V^3)
    in-place loop becomes log2(diameter) shuffle-join rounds)."""
    from ..operators.algorithms import all_pairs_shortest

    types = list(args[0]) if args and args[0] is not None else None
    weight = str(args[1]) if len(args) > 1 and args[1] is not None else None
    directed = bool(args[2]) if len(args) > 2 else True
    rels = graph.rels_for_types(types) if types else graph.rels
    return all_pairs_shortest(rels, weight, directed=directed)


@procedure("algo.astar")
def algo_astar(spark, graph, args):
    """(sourceId, targetId, weightProp?, xProp?, yProp?, directed?,
    geo?) -> (dist) — point-to-point search with admissible-heuristic
    pruning (graph-algo/.../path/AStar.java); geo=true treats
    (xProp, yProp) as (latitude, longitude) and uses the chord-distance
    estimate of GeoEstimateEvaluator.java."""
    from ..operators.algorithms import astar

    src_id, dst_id = int(args[0]), int(args[1])
    weight = str(args[2]) if len(args) > 2 and args[2] is not None else None
    x_col = str(args[3]) if len(args) > 3 and args[3] is not None else None
    y_col = str(args[4]) if len(args) > 4 and args[4] is not None else None
    directed = bool(args[5]) if len(args) > 5 else True
    geo = bool(args[6]) if len(args) > 6 else False
    d = astar(graph.rels, graph.nodes, src_id, dst_id, weight,
              x_col, y_col, directed, geo=geo)
    return spark.createDataFrame([(d,)], "dist double")
