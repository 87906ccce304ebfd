"""Single-process oracle: literal reimplementation of the reference engine.

The reference has zero tests (SURVEY.md §5), so this oracle IS the
correctness standard for the Spark engine:

- tokenize/postings/df layer reproduces /root/reference semantics exactly
  (lexer.rs:66-128, tree.rs:146-160, tree.rs:211-212, tree.rs:413),
- `search_tfidf` reproduces the reference scorer literally
  (tree.rs:419-462) including its quirks,
- `search_bm25` defines the north-star BM25 scorer (k1=1.2, b=0.75) the
  Spark engine must be rank-identical to.

Replicated quirks (SURVEY.md §2.9):
- Q1: N counts ALL docs, including ones that tokenize to nothing
  (lib.rs:251-262 assigns the id before parsing; tree.rs:333-335 early-
  returns without decrementing).
- Q3/P8: TF-IDF drops docs whose accumulated score is exactly 0.0
  (tree.rs:456-459), which hides terms present in every doc (idf=0).
- Q9 (new, from tree.rs:388-452): a query token appearing m times is
  processed m times in pass 2 over a cache that holds m entries per
  segment, with global df accumulated m times in pass 1 — so its df is
  m*df and its contribution is m^2 * tf * idf.
Deliberate deviation (Q6): ties are broken (score desc, doc_id asc);
the reference's tie order is nondeterministic (HashMap iteration).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterable

from .lexer import term_counts, term_occurrences, tokenize

BM25_K1 = 1.2
BM25_B = 0.75


class OracleIndex:
    """In-memory inverted index with reference-parity semantics."""

    def __init__(self, docs: Iterable[tuple[int, str | None]]):
        self.doc_len: dict[int, int] = {}
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.texts: dict[int, str | None] = {}  # for positional verify
        self.n_docs = 0  # Q1: counts empty-token docs too
        for doc_id, text in docs:
            self.n_docs += 1
            self.texts[doc_id] = text
            counts = term_counts(text)
            self.doc_len[doc_id] = sum(counts.values())
            for term, tf in counts.items():
                self.postings.setdefault(term, []).append((doc_id, tf))
        for plist in self.postings.values():
            plist.sort()  # by doc_id (tree.rs:211)
        total_len = sum(self.doc_len.values())
        self.avgdl = (total_len / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    # -- scoring ---------------------------------------------------------

    def search_tfidf(self, query: str, k: int | None = 10) -> list[tuple[int, float]]:
        """Reference scorer: score += m^2 * tf * |ln(N / (m*df))| (see Q9)."""
        q_tokens = tokenize(query)
        mult = Counter(q_tokens)
        scores: dict[int, float] = {}
        for term, m in mult.items():
            df = self.df(term)
            if df == 0:
                continue
            global_df = float(m * df)
            idf = abs(math.log(self.n_docs / global_df))
            weight = m * m * idf
            for doc_id, tf in self.postings[term]:
                scores[doc_id] = scores.get(doc_id, 0.0) + tf * weight
        results = [(d, s) for d, s in scores.items() if s != 0.0]  # P8
        results.sort(key=lambda ds: (-ds[1], ds[0]))
        return results[:k] if k is not None else results

    def search_bm25(self, query: str, k: int | None = 10) -> list[tuple[int, float]]:
        """North-star scorer: standard BM25 over unique query terms."""
        # sorted term order pins float summation order (engine matches it)
        q_terms = sorted(set(tokenize(query)))
        n, avgdl = self.n_docs, self.avgdl
        scores: dict[int, float] = {}
        for term in q_terms:
            df = self.df(term)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for doc_id, tf in self.postings[term]:
                dl = self.doc_len[doc_id]
                norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf * (BM25_K1 + 1.0) / norm
        results = sorted(scores.items(), key=lambda ds: (-ds[1], ds[0]))
        return results[:k] if k is not None else results

    def search_bm25_and(self, query: str, k: int | None = 10) -> list[tuple[int, float]]:
        """Conjunctive BM25: only docs containing ALL distinct query
        terms survive; a term absent from the corpus empties the result.
        Scoring of survivors is identical to search_bm25 (same sorted
        term order -> same float summation order). Extension beyond the
        OR-only reference (SURVEY §2.7)."""
        q_terms = sorted(set(tokenize(query)))
        if not q_terms:
            return []
        n, avgdl = self.n_docs, self.avgdl
        scores: dict[int, float] = {}
        hits: dict[int, int] = {}
        for term in q_terms:
            df = self.df(term)
            if df == 0:
                return []
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for doc_id, tf in self.postings[term]:
                dl = self.doc_len[doc_id]
                norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf * (BM25_K1 + 1.0) / norm
                hits[doc_id] = hits.get(doc_id, 0) + 1
        need = len(q_terms)
        results = sorted(
            ((d, s) for d, s in scores.items() if hits[d] == need),
            key=lambda ds: (-ds[1], ds[0]),
        )
        return results[:k] if k is not None else results

    def phrase_match(self, text: str | None, query: str) -> bool:
        """Naive positional check: does ``text`` contain the query terms
        as a contiguous phrase? Positions index the raw post-lex token
        stream (stop-word slots kept, never indexed), so dropped
        stop-words leave exact-width gaps; repeated query terms must all
        align. The independent (O(tokens^2)-ish, re-derives positions
        from raw text) twin the phrase scorer is tested against."""
        q_occ = term_occurrences(query)
        if not q_occ:
            return False
        d_occ = term_occurrences(text)
        pairs = [
            (set(d_occ.get(t, ())), o) for t, offs in q_occ.items()
            for o in offs
        ]
        t0, o0 = pairs[0]
        return any(
            all((p - o0 + o) in ps for ps, o in pairs[1:])
            for p in t0
        )

    def search_bm25_phrase(self, query: str, k: int | None = 10) -> list[tuple[int, float]]:
        """Positional phrase BM25: conjunctive survivors that also
        contain the phrase contiguously; scoring identical to
        search_bm25_and. Extension (no reference analog)."""
        base = self.search_bm25_and(query, k=None)
        results = [
            (d, s) for d, s in base if self.phrase_match(self.texts[d], query)
        ]
        return results[:k] if k is not None else results

    def search_bm25_bool(
        self, query: str, k: int | None = 10,
        max_expansions: int | None = None,
    ) -> list[tuple[int, float]]:
        """Boolean-language BM25 (syntax shared with boolquery.parse;
        evaluation independent: a naive per-doc recursive check over
        term_counts presence + phrase_match, no set algebra, no index).
        Prefix atoms expand over this oracle's own dictionary (postings
        keys) through the shared cap rule. Matching docs score standard
        BM25 over the distinct positive terms they contain; negated
        terms never score."""
        from .boolquery import (
            And, Or, Phrase, Term, cap_expansions, from_root, parse,
            rewrite_prefixes,
        )

        pq = parse(query)
        if pq.root is None:
            return []
        if pq.has_prefix:
            def expander(prefix: str) -> list[str]:
                pairs = [
                    (t, len(ps)) for t, ps in self.postings.items()
                    if t.startswith(prefix)
                ]
                return (cap_expansions(pairs, max_expansions)
                        if max_expansions is not None
                        else cap_expansions(pairs))

            pq = from_root(rewrite_prefixes(pq.root, expander))
            if pq.root is None:
                return []
        n, avgdl = self.n_docs, self.avgdl
        idf = {
            t: math.log(1.0 + (n - self.df(t) + 0.5) / (self.df(t) + 0.5))
            for t in pq.pos_terms if self.df(t) > 0
        }

        def holds(node, text, counts) -> bool:
            if node is None:
                return False
            if isinstance(node, Term):
                return node.term in counts
            if isinstance(node, Phrase):
                return self.phrase_match(text, node.raw)
            if isinstance(node, And):
                return all(holds(c, text, counts) for c in node.pos) and \
                    not any(holds(c, text, counts) for c in node.neg)
            return any(holds(c, text, counts) for c in node.children)  # Or

        results = []
        for doc_id, text in self.texts.items():
            counts = term_counts(text)
            if not holds(pq.root, text, counts):
                continue
            dl = self.doc_len[doc_id]
            score = 0.0
            for t in sorted(idf):
                tf = counts.get(t)
                if not tf:
                    continue
                norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                score += idf[t] * tf * (BM25_K1 + 1.0) / norm
            results.append((doc_id, score))
        results.sort(key=lambda ds: (-ds[1], ds[0]))
        return results[:k] if k is not None else results

    def near_match(self, text: str | None, query: str, window: int) -> bool:
        """Naive proximity check: do ALL distinct query terms co-occur
        within ``window`` raw-stream token offsets (min-cover span:
        there exists one occurrence of each term with
        max(pos) - min(pos) <= window)? Unordered; query-term
        multiplicity is ignored (NEAR is a co-occurrence predicate, not
        an alignment like phrase_match). Positions index the raw
        post-lex token stream, so dropped stop-words still widen gaps."""
        q_terms = sorted(set(tokenize(query)))
        if not q_terms:
            return False
        d_occ = term_occurrences(text)
        lists = [d_occ.get(t) for t in q_terms]
        if any(not lst for lst in lists):
            return False
        events = sorted(
            (p, ti) for ti, lst in enumerate(lists) for p in lst
        )
        need = len(lists)
        count = [0] * need
        covered = 0
        i = 0
        for j, (pj, tj) in enumerate(events):
            count[tj] += 1
            if count[tj] == 1:
                covered += 1
            while count[events[i][1]] > 1:  # shrink redundant left edge
                count[events[i][1]] -= 1
                i += 1
            if covered == need and pj - events[i][0] <= window:
                return True
        return False

    def search_bm25_near(
        self, query: str, window: int, k: int | None = 10
    ) -> list[tuple[int, float]]:
        """Proximity BM25: conjunctive survivors whose distinct query
        terms co-occur within a ``window``-token span; scoring identical
        to search_bm25_and. Extension (no reference analog)."""
        base = self.search_bm25_and(query, k=None)
        results = [
            (d, s) for d, s in base
            if self.near_match(self.texts[d], query, window)
        ]
        return results[:k] if k is not None else results
