"""Text-analysis column combinators (Column -> Column, Catalyst-native).

Follows the reference's expression-macro style (SURVEY.md §2.10 D2:
plain functions composing Column expressions, never ``F.udf``) so
whole-stage codegen and nested pruning survive. These power the
training-data extension surface: tokenization, shingling, token
counts, quality scoring, language ID, fingerprinting, and the
MinHash/SimHash building blocks in ``operators/dedup.py``.

Normalization semantics modeled on the reference's ES analyzer
(index-settings-and-mappings-necropolis.json:4-33 — lowercase +
asciifolding + shingles), re-expressed as Spark SQL expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the vote-based language-ID
# heuristic. Deliberately small + fixed: the heuristic must be exactly
# reproducible in ANSI SQL for the DuckDB oracle.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
}
#: Deterministic tie-break order for language votes.
LANG_ORDER: tuple[str, ...] = ("en", "de", "fr", "es")


def normalize(col: Column) -> Column:
    """Lowercase, collapse whitespace runs, trim. Collapse-THEN-trim on
    purpose: Spark's ``trim`` strips only 0x20, so trimming first left
    boundary tabs/newlines in place and the collapse turned them into
    boundary SPACES — 'a\\n' normalized to 'a ' (trailing space) and
    downstream splits grew empty tokens. After the collapse every
    whitespace run is a plain space, so the space-only trim is exact.
    The SQL oracle twin (oracles._nrm) mirrors this order."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


#: Accent-folding character map — the asciifolding tier of the
#: reference's ES analyzer (lowercase + asciifolding + shingles,
#: index-settings-and-mappings-necropolis.json:9-14). 1:1 diacritic
#: removals only, both cases, chosen as exactly the subset where ICU
#: asciifolding and DuckDB's ``strip_accents`` agree byte-for-byte
#: (multi-char folds like æ→ae / ß→ss are deliberately excluded:
#: strip_accents passes those through, and the oracle must reproduce
#: every byte). ``translate`` is a codegen'd per-char lookup — no
#: regex, no UDF.
_FOLD_FROM = (
    "àáâãäåāăąèéêëēĕėęěìíîïĩīĭįòóôõöōŏőùúûüũūŭůűýÿçćĉċčñńņňšśŝşžźżğĝřŕďťţĺľȳẽỹṽḡ"
    "ÀÁÂÃÄÅĀĂĄÈÉÊËĒĔĖĘĚÌÍÎÏĨĪĬĮÒÓÔÕÖŌŎŐÙÚÛÜŨŪŬŮŰÝŸÇĆĈĊČÑŃŅŇŠŚŜŞŽŹŻĞĜŘŔĎŤŢĹĽȲẼỸṼḠ"
)
_FOLD_TO = (
    "aaaaaaaaaeeeeeeeeeiiiiiiiioooooooouuuuuuuuuyycccccnnnnsssszzzggrrdttllyeyvg"
    "AAAAAAAAAEEEEEEEEEIIIIIIIIOOOOOOOOUUUUUUUUUYYCCCCCNNNNSSSSZZZGGRRDTTLLYEYVG"
)


def fold_ascii(col: Column) -> Column:
    """Strip Latin diacritics: 'Café' → 'Cafe' (ES asciifolding parity).

    Characters outside the map (including non-Latin scripts and the
    multi-char ligatures) pass through unchanged — the same contract as
    DuckDB's ``strip_accents``, which the oracle uses as the
    independent implementation."""
    return F.translate(col, _FOLD_FROM, _FOLD_TO)


def normalize_folded(col: Column) -> Column:
    """Accent-folded :func:`normalize` — the full ES analyzer
    normalization chain (lowercase + asciifolding + whitespace)."""
    return normalize(fold_ascii(col))


def fingerprint_folded(col: Column) -> Column:
    """Accent-folded :func:`fingerprint`: 'Café'/'Cafe' spellings of
    the same text collide, the way the reference's search analyzer
    folds them at index time."""
    return fingerprint_tok(tokens(fold_ascii(col)))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>, no empties).

    Two regex passes (regex-trim ALL boundary whitespace, then split
    on ``\\s+``) instead of the old ``trim``-then-split: Spark's
    ``trim`` strips only 0x20, so 'hello world\\n' used to tokenize to
    ['hello','world',''] and a tab/newline-only doc to ['',''] — the
    empty-string tokens inflated counts and re-opened the round-1
    blank-doc Jaccard defect word_shingles' guard exists to prevent
    (all whitespace-only docs sharing one singleton shingle). The SQL
    oracle twin (oracles._tok over _nrm) keeps identical values."""
    trimmed = F.regexp_replace(F.lower(col), r"^\s+|\s+$", "")
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (BPE-ish refinement lives in quality metrics)."""
    return F.size(tokens(col)).cast("bigint")


def word_shingles(tok: Column, n: int) -> Column:
    """n-gram word shingles over a token array.

    Non-empty texts shorter than ``n`` tokens yield a single shingle of
    the whole text (standard MinHash convention so short docs still have
    a set). Empty/whitespace-only texts yield the EMPTY set — otherwise
    every blank doc would share the ``[""]`` singleton and Jaccard-match
    every other blank doc at 1.0 (round-1 defect).
    """
    joined = F.concat_ws(" ", tok)
    gen = F.transform(
        F.sequence(F.lit(0), F.size(tok) - n),
        lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
    )
    return (
        F.when(F.size(tok) == 0, F.array().cast("array<string>"))
        .when(F.size(tok) <= n, F.array(joined))
        .otherwise(gen)
    )


def stopword_hits(tok: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (with multiplicity)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tok, lambda t: F.array_contains(sw, t))).cast("bigint")


def language_id_tok(tok: Column) -> Column:
    """Vote-based language guess from a *materialized* token-array
    column: argmax of stopword hits, ties broken by LANG_ORDER; 'und'
    when no stopword matched. Pass a column reference, not an inline
    ``tokens(...)`` expression — the votes reference the array ~12
    times, and HOF lambdas are interpreted (no CSE), so an inline
    expression re-tokenizes the text per reference."""
    votes = {lang: stopword_hits(tok, lang) for lang in LANG_ORDER}
    best = F.greatest(*votes.values())
    out = F.lit("und")
    # Build the CASE from last to first so earlier langs win ties.
    for lang in reversed(LANG_ORDER):
        out = F.when((best > 0) & (votes[lang] == best), F.lit(lang)).otherwise(out)
    return out


def language_id(col: Column) -> Column:
    """Text-column convenience wrapper over :func:`language_id_tok`.

    Convenience only — the inline ``tokens(col)`` is referenced ~12
    times by the vote expressions, and HOF lambdas are interpreted
    (no CSE), so each reference re-tokenizes the full text. On any
    corpus-sized path, materialize the token array once in a
    projection and call :func:`language_id_tok` on the column (what
    the registry query and dataset_card do)."""
    return language_id_tok(tokens(col))


def punct_ratio_nrm(normed: Column) -> Column:
    """Fraction of characters not [a-z0-9 ] in pre-normalized text."""
    stripped = F.regexp_replace(normed, r"[a-z0-9 ]", "")
    return F.when(F.length(normed) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(normed).cast("double")
    )


def punct_ratio(col: Column) -> Column:
    return punct_ratio_nrm(normalize(col))


def stopword_ratio_tok(tok: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are ``lang`` stopwords (quality signal).
    Raises on a language without a stopword list — scoring French text
    by English stopwords would silently gate out the whole corpus."""
    if lang not in STOPWORDS:
        raise ValueError(
            f"no stopword list for lang={lang!r} (have {sorted(STOPWORDS)})"
        )
    return F.when(F.size(tok) == 0, F.lit(0.0)).otherwise(
        stopword_hits(tok, lang).cast("double") / F.size(tok).cast("double")
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return stopword_ratio_tok(tokens(col), lang)


def mean_token_len_tok(tok: Column) -> Column:
    total = F.aggregate(tok, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(tok) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(tok).cast("double")
    )


def mean_token_len(col: Column) -> Column:
    return mean_token_len_tok(tokens(col))


def quality_score_tok(tok: Column, normed: Column) -> Column:
    """Composite [0,1] document-quality score (Gopher-rule-flavored)
    from materialized token/normalized columns: length in a sane band,
    sane mean token length, low punctuation noise, nonzero stopword
    signal. Pure arithmetic -> reproducible in ANSI SQL."""
    n_tok = F.size(tok).cast("bigint")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    mtl = mean_token_len_tok(tok)
    mtl_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio_nrm(normed) <= 0.2, 1.0).otherwise(0.0)
    sw_ok = F.when(stopword_ratio_tok(tok) > 0.0, 1.0).otherwise(0.0)
    return (len_ok + mtl_ok + punct_ok + sw_ok) / F.lit(4.0)


def quality_score(col: Column) -> Column:
    return quality_score_tok(tokens(col), normalize(col))


def fingerprint_tok(tok: Column) -> Column:
    """Canonical key-collision fingerprint: md5 over the sorted distinct
    token set. Two docs that differ only in token order/multiplicity and
    whitespace collide — the classic clustering key for fuzzy dedup."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tok))))


def fingerprint(col: Column) -> Column:
    return fingerprint_tok(tokens(col))


def h60(col: Column) -> Column:
    """Deterministic 60-bit positive hash shared with the SQL oracle:
    first 15 hex chars of md5, parsed base-16. Engine-portable (DuckDB
    reproduces it with list_reduce over hex digits), unlike xxhash64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def rolling_hash(tok: Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial (Rabin-Karp-style) rolling hash over the token stream:
    h = fold(h * base + h60(token) % mod) % mod. Order-sensitive, unlike
    :func:`fingerprint`. All intermediates < 2^61 so ANSI mode never
    overflows."""
    return F.aggregate(
        tok,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * base + F.pmod(h60(t), F.lit(mod))) % mod,
    )


#: BPE-ish pre-tokenization pattern (GPT-2-flavored, ASCII-only and
#: lookahead-free so the Java regex engine and the oracle's RE2 agree):
#: contractions, space-prefixed word/number runs, punctuation runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def bpe_tokens(col: Column) -> Column:
    """BPE-style pre-tokens of the lowercased text (the 'BPE-ish regex'
    tier of token counting — whitespace tokens stay `tokens`)."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col)).cast("bigint")


#: PII patterns (ASCII, lookahead-free — portable between Java regex
#: and RE2): email addresses, IPv4 addresses, long digit runs (phone/
#: account numbers). Order matters: emails first so their digits
#: aren't half-eaten by the number rule.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9][0-9 \-]{6,}[0-9]\b", "<NUMBER>"),
)


def redact_pii(col: Column) -> Column:
    """Replace emails / IPv4s / long digit runs with typed placeholders
    — the scrubbing pass of a training-data pipeline, kept as chained
    regexp_replace so it stays in the scan's projection."""
    out = col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def chunk_structs(tok: Column, chunk_tokens: int = 64, overlap: int = 16) -> Column:
    """Token-window document chunking — the context-length prep op of
    an LLM pipeline: array of (chunk_no, chunk_text, n_tokens) structs
    where chunk i covers tokens [i·stride, i·stride + chunk_tokens)
    with stride = chunk_tokens − overlap, so consecutive chunks share
    ``overlap`` tokens. Chunk count = max(1, ⌈(n − overlap) / stride⌉)
    for non-empty docs (short docs yield one whole-doc chunk); empty
    docs yield no chunks. Pure expressions over a materialized token
    array — explode it and the whole thing stays one narrow stage.
    """
    if overlap >= chunk_tokens or chunk_tokens < 1 or overlap < 0:
        # stride 0 divides by zero (ANSI cast overflow at runtime) and
        # negative stride silently truncates the document to one chunk
        raise ValueError(
            f"chunk_structs: need 0 <= overlap < chunk_tokens "
            f"(got chunk_tokens={chunk_tokens}, overlap={overlap})"
        )
    stride = chunk_tokens - overlap
    n = F.size(tok)
    n_chunks = F.greatest(
        F.lit(1), ((n - overlap + stride - 1) / stride).cast("bigint")
    )
    gen = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_no"),
            F.concat_ws(" ", F.slice(tok, i * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk_tokens), n - i * stride).cast("bigint").alias(
                "n_tokens"
            ),
        ),
    )
    return F.when(n == 0, F.array().cast(
        "array<struct<chunk_no:int,chunk_text:string,n_tokens:bigint>>"
    )).otherwise(gen)


def repetition_ratio_tok(tok: Column, n: int = 2) -> Column:
    """Fraction of within-document n-grams that are repeats of an
    earlier n-gram (Gopher-style repetition signal): 1 - distinct/total.
    0.0 for docs with no n-grams."""
    grams = word_shingles(tok, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(grams)).cast("double") / total.cast("double")
    )


def char_entropy(col: Column) -> Column:
    """Shannon entropy (bits/char) of the raw character distribution —
    the gibberish/encoding-noise quality signal: natural text sits
    near 4-4.5 bits, base64 blobs score high, repeated-char floods
    score near 0. NULL for the empty string.

    Computed entirely in-expression via the aggregate identity
    H = log2(n) − (Σ_d c_d·log2 c_d)/n over the distinct-char counts
    (``split(col, '')`` yields one element per character), so the scan
    stays one narrow codegen stage — no explode, no shuffle. Per-row
    cost is O(len · distinct_chars); distinct chars in real text is
    < 100, which keeps this cheap at any corpus size. The identity
    form (one division at the end, log2-of-integer terms) is what the
    DuckDB oracle mirrors verbatim.
    """
    chars = F.split(col, "")
    # split('', '') yields [''] (size 1), so the empty guard must use
    # char_length, not array size
    n = F.length(col)
    csum = F.aggregate(
        F.transform(
            F.array_distinct(chars),
            lambda d: F.size(F.filter(chars, lambda c: c == d)).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, c: acc + c * F.log2(c),
    )
    return F.when(n <= 0, F.lit(None).cast("double")).otherwise(
        F.log2(n.cast("double")) - csum / n.cast("double")
    )


def syllables_tok(tok: Column) -> Column:
    """Heuristic syllable count of a token array: per word, the number
    of vowel-group runs (``[aeiouy]+``), floored at 1 — the standard
    dictionary-free approximation readability formulas use. Integer
    fold over the token array (0 for empty docs), so the count is
    bit-identical in any engine that runs the same regex."""
    return F.aggregate(
        F.transform(
            tok,
            lambda w: F.greatest(
                F.lit(1), F.regexp_count(w, F.lit("[aeiouy]+"))
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc + s,
    )


def sentence_count(col: Column) -> Column:
    """Sentence-terminator-run count (``[.!?]+``), floored at 1 so an
    unpunctuated document counts as a single sentence — the
    denominator convention of the Flesch family."""
    return F.greatest(F.lit(1), F.regexp_count(col, F.lit("[.!?]+"))).cast(
        "bigint"
    )
