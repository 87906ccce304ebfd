"""English stop-word list.

The reference filters tokens against the English list of the Rust
``stop-words`` crate v0.8.1 (/root/reference/src/lib.rs:95,310 and
Cargo.toml:25), whose default feature set ships the NLTK stop-word lists.
This module vendors that public NLTK English list (179 entries) verbatim.

Reference semantics to preserve (SURVEY.md §2.2 P4, §2.9 Q5):
- filtering happens AFTER stemming (/root/reference/src/lexer.rs:107-115),
- the list itself is NOT stemmed,
- every token kind is checked (numeric and punctuation tokens too — though
  only single-letter entries like "a", "i", "s", "t" can ever match those).

Entries containing apostrophes ("you're", "don't", ...) can never match a
token because the reference lexer splits on punctuation
(/root/reference/src/lexer.rs:66-84) — they are kept for list fidelity.
"""

STOP_WORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not",
    "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've",
    "now", "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren",
    "aren't", "couldn", "couldn't", "didn", "didn't", "doesn",
    "doesn't", "hadn", "hadn't", "hasn", "hasn't", "haven", "haven't",
    "isn", "isn't", "ma", "mightn", "mightn't", "mustn", "mustn't",
    "needn", "needn't", "shan", "shan't", "shouldn", "shouldn't",
    "wasn", "wasn't", "weren", "weren't", "won", "won't", "wouldn",
    "wouldn't",
)

STOP_SET: frozenset[str] = frozenset(STOP_WORDS)
