"""Mechanical splitter: plans/llm.py and plans/relational.py (14.5k LoC
each) -> per-domain packages plans/llm/ and plans/relational/.

Round-9 verdict task 6. Invariants the split must preserve, verified by
the caller afterwards:
- module paths unchanged (``plans.llm`` / ``plans.relational`` keep
  importing, including every top-level name — tests import private
  helpers like ``_POIS1_T`` directly);
- QUERIES/ORACLES dict literals moved VERBATIM into each package
  ``__init__.py`` (registry and oracle strings unchanged);
- every moved code segment is byte-identical to the original (segments
  are sliced from the source lines, never re-rendered), except one
  mechanical rewrite: relative imports gain one leading dot because
  part modules sit one package level deeper.

Strategy: parse top-level nodes, classify each query block (the
``qNNN_*`` function plus its ``_qNNN_sql`` / ``_QNNN_SQL`` siblings,
keyed by query number) into a domain via ordered keyword regexes on the
public function name; non-query helpers go to ``_shared.py`` in original
order; the module docstring, ``__all__``, and the QUERIES/ORACLES
literals go to ``__init__.py``. Cross-module name needs are resolved by
explicit ``from ._x import (...)`` lists computed from an
over-approximate Load/Store analysis (over-importing is harmless; the
371-query selfcheck is the behavioral gate). Import cycles between
parts abort the split.
"""

from __future__ import annotations

import ast
import builtins
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "airflow_spotify_etl_spark", "plans")

# Ordered: first match wins.
LLM_DOMAINS = [
    ("sampling", r"sample|stratified_split|leakage|mixture|quota|pack_sequences|budget_selection|dsir|curriculum|interleaved|scaling_subsets|contrastive|fim_transform|span_corruption|temperature|length_bucket|diversity_cap"),
    ("retrieval", r"bm25|rag_|tfidf|phrase_search|rrf|ndcg|average_precision|mmr_|keyword|context_fit"),
    ("dedup", r"dedup|minhash|simhash|jaccard|lsh|fingerprint|winnow|span_dup|span_excision|containment|copy_rings|contamination|decontamination|bag_of_words|edit_distance|chunk|signature|cluster_size|boilerplate|source_overlap|near_dup|novelty|bloom|kmv|capture_recapture|pipeline_funnel|quality_aware_keepers"),
    ("ann", r"cosine|ivf|pq_|_pq|sq8|hamming|embedding|mrl|hubness|isotropy|quantization|ann_|knn|centroid|semantic|sketch_audit"),
    ("text", r"text_stats|token|lang|vocab|entropy|unigram|bigram|ngram|pii|quality|gopher|perplexity|readability|zipf|burstiness|mattr|kneser|good_turing|bpe|keyness|flesch|heaps|chao1|lexical|repetition|corpus_datasheet|fertility|distinct_n|source_length|pmi|top_terms|kn_|stopword|phrase"),
    ("evalstats", r"psi|js_|drift|jackknife|calibration|isotonic|roc|auc|effect_size|nmi|murphy|neyman|rank_biased|kappa|ks_two|g_test|tvd|mood|armitage|jonckheere|davies|silhouette|calinski|pca|hyperloglog|quantile_norm|lift|anderson|hellinger|delong|scorecard|dispersion|reliability|threshold_sweep|confusion|k_anonymity|l_diversity|t_closeness|partition_layout|k_sample"),
]

REL_DOMAINS = [
    ("layout_ops", r"skew_report|epoch_shuffle|salted|range_boundaries|join_cardinality|zorder|cdc_apply|merge_upsert|snapshot|scd2|partition_layout|compaction|resharding|shuffle_mixing|watermark|deletion_manifest|join_skew|integrity|temporal_dim|incremental_rollup|expectations|stats_drift|rate_anomalies"),
    ("behavior", r"funnel|cohort|retention|attribution|conversion|session|rfm_|_ltv|stickiness|dau|abc_classification|pareto|trending|peak_concurrency|time_avg_concurrency|growth_accounting|novelty_decay|curriculum_order|multitouch|sequence_patterns|path_trigrams"),
    ("timeseries", r"rolling|hourly|gap_fill|ohlc|time_weighted|autocorrel|cusum|seasonal|hurst|gumbel|changepoint|mann_kendall|theil_sen|haar|markov|interevent|burstiness|runs_test|turning|cox_stuart|yule_walker|ljung|durbin|page_hinkley|pettitt|chow|backtest|lead_lag|sprt|page_trend|weekday|forecast|kcore|assortativity|percolation|transition"),
    ("stats", r"spearman|kappa|ks_test|mann_whitney|gini|theil_decomp|kendall|mcnemar|hhi|anova|kruskal|welch|ttest|bh_fdr|wasserstein|bootstrap|optimal_segmentation|robust_means|simpson|mantel|srm|cuped|mix_shift|wilson|aa_test|loo_target|benford|mad_outliers|chi_square|weighted_median|friedman|logrank|lorenz|duration_planner|dunn|brown_forsythe|cramer|fleiss|cochran|ordinal|kendalls_w|woe_iv|delta_method|ansari|nelson_aalen|kaplan_meier|quality_report|value_outliers|percentiles|histogram|skew|fano"),
]


def classify(fn_name: str, domains, default: str) -> str:
    for dom, pat in domains:
        if re.search(pat, fn_name):
            return dom
    return default


def bump_relative_imports(text: str) -> str:
    # part modules are one package level deeper than the original file
    return re.sub(
        r"(^\s*from )(\.+)([\w.]*)( import )",
        lambda m: m.group(1) + "." + m.group(2) + m.group(3) + m.group(4),
        text,
        flags=re.M,
    )


class Binder(ast.NodeVisitor):
    """Collect every Name load and every bound name (any scope)."""

    def __init__(self):
        self.loads: set[str] = set()
        self.stores: set[str] = set()

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.loads.add(node.id)
        else:
            self.stores.add(node.id)
        self.generic_visit(node)

    def visit_FunctionDef(self, node):
        self.stores.add(node.name)
        for a in (
            node.args.args + node.args.posonlyargs + node.args.kwonlyargs
        ):
            self.stores.add(a.arg)
        if node.args.vararg:
            self.stores.add(node.args.vararg.arg)
        if node.args.kwarg:
            self.stores.add(node.args.kwarg.arg)
        self.generic_visit(node)

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_alias(self, node):
        self.stores.add((node.asname or node.name).split(".")[0])

    def visit_ExceptHandler(self, node):
        if node.name:
            self.stores.add(node.name)
        self.generic_visit(node)

    def visit_comprehension(self, node):
        self.generic_visit(node)


def split_file(stem: str, domains, default: str) -> None:
    path = os.path.join(PLANS, stem + ".py")
    src = open(path).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    segments = []  # (kind, name, qnum, text)
    prev_end = 0
    qnum_domain: dict[int, str] = {}
    for node in tree.body:
        start = prev_end  # include comments/blank lines since last node
        end = node.end_lineno
        text = "".join(lines[start:end])
        prev_end = end
        name = None
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            name = node.name
        elif isinstance(node, ast.Assign) and len(node.targets) == 1 and \
                isinstance(node.targets[0], ast.Name):
            name = node.targets[0].id
        if isinstance(node, ast.Expr) and not segments:
            segments.append(("docstring", None, None, text))
            continue
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            segments.append(("import", None, None, text))
            continue
        if name in ("QUERIES", "ORACLES", "__all__"):
            segments.append(("initonly", name, None, text))
            continue
        m = re.match(r"^_?[qQ](\d+)_", name or "")
        if m:
            qn = int(m.group(1))
            segments.append(("query", name, qn, text))
            if isinstance(node, ast.FunctionDef) and re.match(
                r"^q\d+_", name
            ):
                qnum_domain[qn] = classify(name, domains, default)
        else:
            segments.append(("helper", name, None, text))

    imports_text = "".join(t for k, _, _, t in segments if k == "import")

    # assemble module bodies
    modules: dict[str, list[str]] = {"_shared": []}
    for k, name, qn, text in segments:
        if k == "helper":
            modules["_shared"].append(text)
        elif k == "query":
            dom = qnum_domain.get(qn, default)
            modules.setdefault(dom, []).append(text)

    # oversize guard: split any domain over ~3800 body lines in order
    final: dict[str, list[str]] = {}
    for dom, texts in modules.items():
        total = sum(t.count("\n") for t in texts)
        if total <= 3800 or dom == "_shared":
            final[dom] = texts
            continue
        n_parts = total // 3800 + 1
        per = total / n_parts
        acc, cur, idx = 0, [], 1
        for t in texts:
            cur.append(t)
            acc += t.count("\n")
            if acc >= per and idx < n_parts:
                final[f"{dom}{idx}"] = cur
                cur, acc = [], 0
                idx += 1
        if cur:
            final[f"{dom}{idx}"] = cur

    # top-level defined names per module
    defined: dict[str, list[str]] = {}
    for dom, texts in final.items():
        body = ast.parse(imports_text + "".join(texts))
        names = []
        for n in body.body:
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                names.append(n.name)
            elif isinstance(n, ast.Assign):
                for t in n.targets:
                    if isinstance(t, ast.Name):
                        names.append(t.id)
        defined[dom] = names
    owner = {}
    for dom, names in defined.items():
        for n in names:
            owner.setdefault(n, dom)

    builtin_names = set(dir(builtins))

    # import-bound names from the original import block
    ib = Binder()
    ib.visit(ast.parse(imports_text))
    import_bound = ib.stores

    # cross-module needs
    deps: dict[str, dict[str, list[str]]] = {}
    for dom, texts in final.items():
        b = Binder()
        b.visit(ast.parse("".join(texts)))
        need = {}
        for n in sorted(b.loads):
            if n in builtin_names or n in import_bound:
                continue
            if n in defined[dom]:
                continue
            src_dom = owner.get(n)
            if src_dom and src_dom != dom:
                need.setdefault(src_dom, []).append(n)
        deps[dom] = need

    # cycle check
    def reach(a, seen):
        for b2 in deps.get(a, {}):
            if b2 in seen:
                raise SystemExit(
                    f"IMPORT CYCLE in {stem}: {b2} <-> {a} via {seen}"
                )
            reach(b2, seen | {b2})

    for dom in deps:
        reach(dom, {dom})

    # write package
    pkg = os.path.join(PLANS, stem)
    os.makedirs(pkg, exist_ok=True)
    for dom, texts in final.items():
        hdr = (
            f'"""Mechanically split from plans/{stem}.py (round 9) — '
            f"segment contents are verbatim; see package __init__.\"\"\"\n\n"
        )
        dep_imports = "".join(
            "from .{} import (\n{}\n)\n".format(
                d, "\n".join(f"    {n}," for n in ns)
            )
            for d, ns in sorted(deps[dom].items())
        )
        # bump only the ORIGINAL relative imports (one level deeper now);
        # generated cross-part imports are already package-local.
        body = (
            hdr
            + bump_relative_imports(imports_text)
            + dep_imports
            + bump_relative_imports("".join(texts))
        )
        with open(os.path.join(pkg, dom + ".py"), "w") as f:
            f.write(body)

    docstring = next(t for k, _, _, t in segments if k == "docstring")
    initonly = [t for k, n, _, t in segments if k == "initonly"]
    reexports = "".join(
        "from .{} import (\n{}\n)\n".format(
            d, "\n".join(f"    {n}," for n in sorted(defined[d]))
        )
        for d in sorted(final)
        if defined[d]
    )
    init = (
        docstring
        + "\n# Mechanically split into per-domain part modules (round 9):\n"
        + "".join(f"#   .{d}\n" for d in sorted(final))
        + "# Every top-level name re-exported here so existing imports\n"
        + "# (including private helpers used by tests) keep working; the\n"
        + "# QUERIES/ORACLES literals below are verbatim from the original\n"
        + "# single-file module.\n\n"
        + reexports
        + "\n"
        + "".join(initonly)
    )
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write(init)
    os.remove(path)
    sizes = {
        d: sum(t.count("\n") for t in ts) for d, ts in final.items()
    }
    print(stem, "->", {d: sizes[d] for d in sorted(sizes)})


def main() -> int:
    split_file("llm", LLM_DOMAINS, "misc")
    split_file("relational", REL_DOMAINS, "core")
    return 0


if __name__ == "__main__":
    sys.exit(main())
