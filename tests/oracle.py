"""Pure-Python search oracle (SURVEY.md §5.2): the pinned rank/score
reference for every fixture query. Independent of Spark — plain dicts +
math.log — mirroring the pinned semantics documented in
fugu_spark.search (boolean combine, phrase idf-sum, tie-break)."""

from __future__ import annotations

from collections import Counter, defaultdict

from fugu_spark.bm25 import bm25_py, idf_py
from fugu_spark.queryparse import parse_query
from fugu_spark.tokenizer import DEFAULT_MODE, tokenize_py


class PyIndex:
    def __init__(self, docs: dict[int, str], mode: str = DEFAULT_MODE):
        self.mode = mode
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = tokenize_py(text, mode)
            self.doc_len[doc_id] = len(toks)
            for term, pos in toks:
                self.postings[term].setdefault(doc_id, []).append(pos)
        self.n_docs = len(docs)
        total = sum(self.doc_len.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def term_scores(self, term: str, boost: float = 1.0, k1=1.2, b=0.75) -> dict[int, float]:
        out = {}
        df = self.df(term)
        if df == 0:
            return out
        for doc_id, positions in self.postings[term].items():
            out[doc_id] = boost * bm25_py(
                len(positions), df, self.doc_len[doc_id], self.n_docs, self.avgdl, k1, b
            )
        return out

    @staticmethod
    def _slop_tf(pos_lists: list[list[int]], slop: int) -> int:
        """Brute-force sloppy-phrase tf (independent of the engine's
        greedy chain): count distinct end positions admitting an ordered
        chain p_1 < … < p_n with p_n − p_1 − (n−1) ≤ slop."""
        import itertools

        n = len(pos_lists)
        ends = set()
        for combo in itertools.product(*pos_lists):
            if all(combo[i] < combo[i + 1] for i in range(n - 1)) and combo[-1] - combo[
                0
            ] - (n - 1) <= slop:
                ends.add(combo[-1])
        return len(ends)

    @staticmethod
    def _near_tf(pos_lists: list[list[int]], slop: int) -> int:
        """Reference for the UNORDERED span_near tf (queryparse.Leaf.near
        pinned semantics): sweep the merged position-sorted occurrences;
        count positions where the latest occurrence of every clause term
        fits in a window of slop + n − 1."""
        n = len(pos_lists)
        w = slop + n - 1
        merged = sorted((p, i) for i, ps in enumerate(pos_lists) for p in ps)
        last = [-1] * n
        tf = 0
        for p, i in merged:
            last[i] = p
            lo = min(last)
            if lo >= 0 and p - lo <= w:
                tf += 1
        return tf

    def phrase_scores(
        self, terms, boost: float = 1.0, k1=1.2, b=0.75, slop: int = 0, near: bool = False
    ) -> dict[int, float]:
        if near:
            terms = tuple(dict.fromkeys(terms))  # duplicates collapse (pinned)
        if any(self.df(t) == 0 for t in terms):
            return {}
        idf_sum = sum(idf_py(self.df(t), self.n_docs) for t in terms)
        out = {}
        docs = set(self.postings[terms[0]])
        for t in terms[1:]:
            docs &= set(self.postings[t])
        for doc_id in docs:
            if near:
                tfp = self._near_tf([self.postings[t][doc_id] for t in terms], slop)
            elif slop:
                tfp = self._slop_tf([self.postings[t][doc_id] for t in terms], slop)
            else:
                cur = set(self.postings[terms[0]][doc_id])
                for t in terms[1:]:
                    cur = {p + 1 for p in cur} & set(self.postings[t][doc_id])
                tfp = len(cur)
            if tfp == 0:
                continue
            dl = self.doc_len[doc_id]
            norm = k1 * (1.0 - b + b * dl / self.avgdl)
            out[doc_id] = boost * idf_sum * tfp * (k1 + 1.0) / (tfp + norm)
        return out

    def _eval_node(self, node, k1, b):
        """Nested boolean eval → {doc_id: score} of matching docs, or None
        for a dead (absent-term) node. Mirrors search._execute_node."""
        from fugu_spark.queryparse import Leaf

        if isinstance(node, Leaf):
            if node.is_phrase:
                return self.phrase_scores(
                    node.terms, node.boost, k1, b, node.slop, near=node.near
                )
            return self.term_scores(node.terms[0], node.boost, k1, b)
        musts, shoulds, nots = [], [], []
        for occ, child in node.children:
            f = self._eval_node(child, k1, b)
            if occ == "must":
                if not f:
                    return {}
                musts.append(f)
            elif occ == "must_not":
                if f:
                    nots.append(f)
            elif f:
                shoulds.append(f)
        if musts:
            docs = set(musts[0])
            for f in musts[1:]:
                docs &= set(f)
            base = {d: sum(f[d] for f in musts) for d in docs}
            for f in shoulds:
                for d in docs:
                    if d in f:
                        base[d] += f[d]
        elif shoulds:
            base = defaultdict(float)
            for f in shoulds:
                for d, s in f.items():
                    base[d] += s
            base = dict(base)
        elif nots:
            base = {d: 1.0 for d in self.doc_len}
        else:
            return None
        for f in nots:
            base = {d: s for d, s in base.items() if d not in f}
        return base

    def search_dsl(self, dsl: dict, k: int = 10, k1=1.2, b=0.75):
        """Evaluate a structured-DSL query (fugu_spark.dsl shapes, incl.
        span_near) through the nested-boolean oracle path."""
        from fugu_spark.dsl import compile_query
        from fugu_spark.queryparse import BoolNode

        plan = compile_query(dsl, mode=self.mode)
        root = plan.root or BoolNode(
            children=tuple((l.occur, l) for l in plan.leaves)
        )
        scored = self._eval_node(root, k1, b) or {}
        return sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]

    def search(self, query: str | None, k: int = 10, k1=1.2, b=0.75):
        plan = parse_query(query, mode=self.mode)
        if plan.is_all:
            scored = {d: 1.0 for d in self.doc_len}
            return sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
        if plan.root is not None:
            scored = self._eval_node(plan.root, k1, b) or {}
            return sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
        leaf_maps = []
        for leaf in plan.leaves:
            if leaf.is_phrase:
                leaf_maps.append(
                    self.phrase_scores(
                        leaf.terms, leaf.boost, k1, b, leaf.slop, near=leaf.near
                    )
                )
            else:
                leaf_maps.append(self.term_scores(leaf.terms[0], leaf.boost, k1, b))
        musts, must_nots = set(plan.musts), set(plan.must_nots)
        positive = [i for i in range(len(plan.leaves)) if i not in must_nots]
        excluded = set()
        for i in must_nots:
            excluded |= set(leaf_maps[i])
        if not positive:
            scored = {d: 1.0 for d in self.doc_len if d not in excluded}
            return sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
        # musts on absent terms → empty
        if any(not leaf_maps[i] and i in musts for i in range(len(plan.leaves))):
            return []
        acc: dict[int, float] = defaultdict(float)
        must_hits: dict[int, int] = Counter()
        for i in positive:
            for doc_id, s in leaf_maps[i].items():
                acc[doc_id] += s
                if i in musts:
                    must_hits[doc_id] += 1
        out = [
            (d, s)
            for d, s in acc.items()
            if must_hits[d] == len(musts) and d not in excluded
        ]
        return sorted(out, key=lambda x: (-x[1], x[0]))[:k]
