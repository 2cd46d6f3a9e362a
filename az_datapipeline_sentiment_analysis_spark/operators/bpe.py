"""Shared BPE (byte-pair encoding) helpers.

The ``|sym||sym|...|`` word encoding makes a literal ``replace`` of
``|l||r|`` with ``|lr|`` exactly BPE's leftmost-nonoverlapping greedy
merge in BOTH Spark SQL and DuckDB (the delimiters make the pattern
self-delimiting: no symbol-boundary false matches, no
consumed-delimiter miss — proven in tests/test_r9.py). Training
(``plans/queries_r9.bpe_train_merges``) and application
(``plans/queries_r10.bpe_apply_encode``) share the oracle's training
CTEs from here so the two entries can never drift; plans modules must
not import each other (worker-side circular-import guard,
tests/test_plans.py), so the shared text lives in operators/.

Reference behavior generalized: the reference pipeline processes
review text driver-side via a remote sentiment API, batching rows
ten at a time (FunctionApp2/process_data/__init__.py); this module
is the distributed tokenizer-training/encoding analog of that
text-processing stage.
"""

from __future__ import annotations

# Merge rounds learned by the trainer and applied by the encoder.
BPE_ROUNDS = 3


def train_ctes(k: int) -> tuple[list[str], list[str]]:
    """DuckDB CTE fragments for k-round BPE training.

    Returns ``(ctes, selects)``: ``ctes`` builds the word-frequency
    table ``w``, the encoded frame ``s0``, and per round r the pair
    counts ``p{r}``, the argmax merge ``m{r}`` (count desc, pair asc)
    and the merged frame ``s{r}``; ``selects`` yields one
    merge-table row per round. Callers compose them into a full
    statement (training output) or extend them with apply CTEs
    (encoding output).
    """
    ctes = [
        """
    w AS (
      SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
              AS tok FROM documents)
      WHERE length(tok) >= 2 GROUP BY tok
    ),
    s0 AS (
      SELECT '|' || array_to_string(regexp_extract_all(word, '.'), '||')
             || '|' AS s, n
      FROM w
    )"""
    ]
    selects = []
    for r in range(1, k + 1):
        prev = f"s{r - 1}"
        ctes.append(f"""
    p{r} AS (
      SELECT a[i] AS l, a[i+1] AS r, CAST(SUM(n) AS BIGINT) AS c
      FROM (SELECT string_split(trim(s, '|'), '||') AS a, n FROM {prev}),
           unnest(generate_series(1, len(a) - 1)) AS g(i)
      GROUP BY 1, 2
    ),
    m{r} AS (SELECT l, r, c FROM p{r} ORDER BY c DESC, l, r LIMIT 1),
    s{r} AS (
      SELECT replace(s,
               '|' || (SELECT l FROM m{r}) || '||'
                   || (SELECT r FROM m{r}) || '|',
               '|' || (SELECT l FROM m{r})
                   || (SELECT r FROM m{r}) || '|') AS s, n
      FROM {prev}
    )""")
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS merge_rank, l AS left_sym,"
            f" r AS right_sym, l || r AS merged, c AS pair_count"
            f" FROM m{r}"
        )
    return ctes, selects


def train_oracle_sql(k: int) -> str:
    """k unrolled merge rounds in DuckDB: word-frequency table ->
    per-round weighted pair counts -> top pair (count desc, pair asc)
    -> leftmost-nonoverlapping replace on the |sym||sym| encoding."""
    ctes, selects = train_ctes(k)
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def sql_quote(s: str) -> str:
    """Single-quote a learned symbol as a SQL string literal (symbols
    come from [a-z]+ so this is belt-and-braces)."""
    return "'" + s.replace("'", "''") + "'"
