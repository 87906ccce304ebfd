"""Deterministic synthetic transcripts corpus + reference query set.

Shape follows BASELINE.json's input_hint / FIXTURES.md §1: an (Iceberg-
style) table of multi-turn conversation/agent transcripts with columns
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). Vocabulary is Zipf(s≈1.1) so hot-term skew is real at test
scale, salted with digit runs, punctuation, stop words, mixed alnum,
empty strings and a Unicode-adversarial subset (FIXTURES.md) to pin
tokenizer parity with the reference lexer.

Everything is seeded (seed=42 default) and generated with
numpy.random.default_rng — no external data.
"""

from __future__ import annotations

import string

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["bash", "search", "browser", "python", "editor"])

# Tokenizer-adversarial strings (quirks Q4/Q5; SURVEY.md §7 hard part 1).
ADVERSARIAL = (
    "don't", "3.14", "x.y", "a,b=c", "abc123", "123abc", "(nested)",
    "the and of was", "running flies easily", "don't-stop!",
    "café", "naïve", "résumé", "über-fast", "①", "٣٤٥", "Ⅻ", "x²",
    "a_b", "semi;colon", "e.g.", "100%", "$5", "it's",
)


def make_vocab(size: int = 2000, seed: int = 42) -> list[str]:
    """Deterministic synthetic word list (lowercase ASCII, len 3-10)."""
    rng = np.random.default_rng(seed)
    letters = np.array(list(string.ascii_lowercase))
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < size:
        n = int(rng.integers(3, 11))
        w = "".join(rng.choice(letters, size=n))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return p / p.sum()


def gen_transcripts(
    n_turns: int,
    seed: int = 42,
    vocab_size: int = 2000,
    mean_turn_len: int = 40,
    mean_conv_len: int = 8,
) -> pd.DataFrame:
    """Generate exactly ``n_turns`` transcript rows, deterministically."""
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(vocab_size, seed))
    probs = _zipf_probs(vocab_size)

    # conversation lengths: geometric, min 1
    conv_lens: list[int] = []
    total = 0
    while total < n_turns:
        ln = int(rng.geometric(1.0 / mean_conv_len))
        ln = min(ln, n_turns - total)
        conv_lens.append(ln)
        total += ln

    conv_ids, turn_idxs = [], []
    for c, ln in enumerate(conv_lens):
        cid = f"conv_{c:08d}"
        conv_ids.extend([cid] * ln)
        turn_idxs.extend(range(ln))

    n = n_turns
    roles = ROLES[rng.integers(0, 4, size=n)]
    # turn 0 of each conversation is always 'user'
    roles = np.where(np.array(turn_idxs) == 0, "user", roles)

    # text lengths 5..200 tokens, mean ~mean_turn_len
    lens = np.clip(rng.poisson(mean_turn_len, size=n), 5, 200)
    empty = rng.random(n) < 0.005  # ~0.5% empty turns
    adv_mask = rng.random(n) < 0.05  # ~5% of turns get an adversarial salt

    word_draw = rng.choice(vocab, size=int(lens.sum()), p=probs)
    texts: list[str] = []
    pos = 0
    adv_pick = rng.integers(0, len(ADVERSARIAL), size=n)
    for i in range(n):
        ln = int(lens[i])
        if empty[i]:
            texts.append("")
            pos += ln
            continue
        words = word_draw[pos : pos + ln]
        pos += ln
        t = " ".join(words)
        if adv_mask[i]:
            t = t + " " + ADVERSARIAL[adv_pick[i]]
        texts.append(t)

    tools = np.where(
        roles == "tool", TOOLS[rng.integers(0, len(TOOLS), size=n)], None
    )
    base = np.datetime64("2026-01-01T00:00:00")
    ts = base + np.cumsum(rng.integers(1, 30, size=n)).astype("timedelta64[s]")

    return pd.DataFrame(
        {
            "conv_id": pd.array(conv_ids, dtype="string"),
            "turn_idx": np.array(turn_idxs, dtype=np.int32),
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "tool": pd.array(tools, dtype="string"),
            "ts": ts.astype("datetime64[us]"),
        }
    )


def gen_queries(seed: int = 42, vocab_size: int = 2000) -> list[tuple[int, str, int]]:
    """Fixed reference query set: (qid, query_text, k) — FIXTURES.md §2."""
    vocab = make_vocab(vocab_size, seed)
    hot, warm, mid = vocab[0], vocab[1], vocab[len(vocab) // 2]
    rare, rarer = vocab[-2], vocab[-1]
    queries = [
        hot,                                #  0 hottest single term
        rare,                               #  1 rare single term
        f"{hot} {mid}",                     #  2 hot + mid
        f"{warm} {rare} {mid}",             #  3 three terms
        f"{hot} {warm} {mid} {rare} {rarer}",  # 4 five terms
        "the and of",                       #  5 stop-words only -> empty
        "3 14",                             #  6 digit query
        "don't",                            #  7 punctuation split
        "zzzzqqqqxxxx",                     #  8 absent term
        f"{mid} {mid}",                     #  9 repeated term (quirk Q9)
        "café",                             # 10 unicode
        "",                                 # 11 empty query
        f"{rare} don't 3.14",               # 12 mixed
        "running flies easily",             # 13 stemming-sensitive
        f"{vocab[2]} {vocab[3]}",           # 14
        f"{vocab[5]} {vocab[100]}",         # 15
        f"{vocab[10]} {vocab[500]} {vocab[1000]}",  # 16
        "abc123",                           # 17 mixed alnum token
        "x.y",                              # 18 -> x . y
        f"{vocab[50]}",                     # 19
        f"{vocab[200]} {vocab[300]}",       # 20
        f"{vocab[7]} {rarer}",              # 21 hot+rarest
        "Ⅻ ٣٤٥",                            # 22 non-ASCII numerics
        f"{vocab[4]} {vocab[6]} {vocab[8]}",   # 23
        f"{vocab[1500]} {vocab[1700]}",     # 24 tail terms
    ]
    return [(i, q, 10) for i, q in enumerate(queries)]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic stateless 64-bit mix (public-domain splitmix64)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def transcripts_spark(
    spark,
    n_turns: int,
    seed: int = 42,
    vocab_size: int = 2000,
    mean_turn_len: int = 40,
    turns_per_conv: int = 16,
    num_partitions: int | None = None,
):
    """Distributed deterministic transcripts synthesis (the scale path).

    Every cell is a pure function of the global turn id via splitmix64, so
    the corpus is identical under ANY partitioning/parallelism — which is
    what lets the scaling bench feed byte-identical input to local[8] and
    local[32]. Driver does no per-row work (spark.range -> mapInPandas)."""
    import pandas as pd_  # local alias shipped to executors in the closure

    vocab = np.array(make_vocab(vocab_size, seed) + list(ADVERSARIAL))
    vocab_list = vocab.tolist()  # pa.array source (rebuilt per task, tiny)
    probs = _zipf_probs(len(vocab))
    cum = np.cumsum(probs)
    cum[-1] = 1.0
    roles = np.array(["user", "assistant", "system", "tool"])
    tools = TOOLS
    base_ts = np.datetime64("2026-01-01T00:00:00")
    sd = np.uint64(seed)

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        # vocab as an Arrow array once per task: word draws become a C
        # take() + per-doc space-join (binary_join) instead of a Python
        # " ".join over every drawn word — the join loop dominated synth
        # wall at 2M turns (strings are built once, in Arrow buffers)
        vocab_pa = pa.array(vocab_list, type=pa.string())
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            n = ids.size
            conv = (ids // turns_per_conv).astype(np.int64)
            turn = (ids % turns_per_conv).astype(np.int32)
            h0 = _splitmix64(ids * np.uint64(1000003) + sd)
            lens = (5 + (h0 % np.uint64(2 * mean_turn_len - 5))).astype(np.int64)
            empty = (_splitmix64(h0) % np.uint64(1000)) < 5
            lens[empty] = 0
            role_ix = (_splitmix64(h0 + np.uint64(7)) % np.uint64(4)).astype(np.int64)
            role_ix[turn == 0] = 0
            total = int(lens.sum())
            # word draws: hash(id, j) -> uniform -> Zipf via searchsorted
            doc_of = np.repeat(np.arange(n), lens)
            j_of = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(lens)[:-1])), lens
            )
            hw = _splitmix64(
                ids[doc_of] * np.uint64(0x51_7C_C1B7) + np.uint64(17) * j_of.astype(np.uint64) + sd
            )
            u = hw.astype(np.float64) / 2**64
            widx = np.searchsorted(cum, u, side="right")
            words_pa = vocab_pa.take(
                pa.array(np.clip(widx, 0, len(vocab) - 1))
            )
            bounds = np.concatenate(([0], np.cumsum(lens)))
            doc_lists = pa.ListArray.from_arrays(
                pa.array(bounds, type=pa.int32()), words_pa
            )
            texts = pc.binary_join(doc_lists, " ").to_pandas()
            rl = roles[role_ix]
            tool = np.where(
                rl == "tool",
                tools[(_splitmix64(h0 + np.uint64(13)) % np.uint64(len(tools))).astype(np.int64)],
                None,
            )
            ts = base_ts + ids.astype("timedelta64[s]")
            # few unique convs per batch -> format each once, broadcast back
            uconv, inv = np.unique(conv, return_inverse=True)
            conv_strs = np.array([f"conv_{c:010d}" for c in uconv])[inv]
            yield pd_.DataFrame(
                {
                    "conv_id": conv_strs,
                    "turn_idx": turn,
                    "role": rl,
                    "text": texts,
                    "tool": tool,
                    "ts": ts.astype("datetime64[us]"),
                }
            )

    if num_partitions is None:
        # cap rows per task: one observed Spark 4.1 Arrow-stream hang on a
        # 4M-row mapInPandas task; 250k-row tasks also balance better
        num_partitions = max(
            spark.sparkContext.defaultParallelism, -(-n_turns // 250_000)
        )
    df = spark.range(0, n_turns, 1, num_partitions)
    return df.mapInPandas(
        gen,
        schema="conv_id string, turn_idx int, role string, text string, "
               "tool string, ts timestamp",
    )


def write_transcripts_parquet(path: str, n_turns: int, seed: int = 42, **kw) -> pd.DataFrame:
    """Write the corpus as a single parquet file (pyarrow); returns the pdf."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = gen_transcripts(n_turns, seed=seed, **kw)
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), path)
    return pdf
