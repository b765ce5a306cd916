"""A88 — simple_query_string (ES ``simple_query_string`` / Lucene
``SimpleQueryParser``): the LENIENT user-facing query syntax.

Search boxes can't throw parse errors at users. This grammar never
raises on malformed input — broken constructs degrade instead of
failing, and whatever remains parseable still runs:

  ``+``         AND between clauses (also inline: ``foo+bar``)
  ``|``         OR between clauses (also inline: ``foo|bar``)
  ``-``         negates the next clause (must_not)
  ``"a b"``     exact phrase
  ``( ... )``   grouping
  ``foo*``      prefix expansion over the term dictionary
  ``foo~N``     fuzzy expansion (Levenshtein <= N; bare ``~`` = 1 edit)
  whitespace    the default operator (``default_operator``: 'or' like ES)

Pinned leniency rules (each tested): an unterminated quote drops the
quote character and parses the rest as words; an unmatched ``)`` is
dropped; an unclosed ``(`` auto-closes at end of input; dangling /
doubled operators collapse; an empty group is dropped; a clause whose
expansion is empty (or a pure-negative group) matches NOTHING — it
becomes an impossible sentinel term, so ``AND`` scopes containing it
correctly match nothing while ``OR`` scopes degrade gracefully.

Pinned divergences from Lucene's SimpleQueryParser, documented rather
than approximated silently: operators fold LEFT-ASSOCIATIVELY with equal
precedence (``a + b | c`` == ``(a AND b) OR c``); negated clauses attach
to their WHOLE group as ``AND NOT`` (``a -b c`` == ``(a OP c) AND NOT b``
— the must_not-at-the-boolean-level grouping, under either default
operator); a
``~N`` slop suffix on a phrase is accepted but served as the exact
phrase (sloppy phrases live in the flat grammar, ``search_phrase_sloppy``).

Everything downstream is the A56 boolean-tree machinery: the translated
tree serves through ``search_bool`` (driver) or
``search_bool_distributed`` (cluster), and expansion-free trees get their
DuckDB oracle from the same AST via ``bool_oracle_sql`` — the parser adds
zero new execution surface.
"""

from __future__ import annotations

from miru_spark.index.reader import IndexReader
from miru_spark.plans.booltree import BAnd, BNot, BOr, BPhrase, BTerm, Node

# a term no whitespace-tokenized vocabulary can contain (content would need
# a literal NUL); used for clauses that must match nothing
IMPOSSIBLE = "\x00<matches-nothing>"

# '-' is NOT in the word-stop set: it negates only at clause start (the
# lexer's explicit branch); anywhere else it is a literal word character
# ('foo-bar' stays one token, as ES treats mid-token hyphens)
_WORD_STOP = set('()|+"')


def _lex(query: str) -> list[tuple[str, str]]:
    """(kind, text) tokens; kind in {lp, rp, or, and, neg, word, phrase}.
    Never raises."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(query)

    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
        elif c == "(":
            out.append(("lp", c)); i += 1
        elif c == ")":
            out.append(("rp", c)); i += 1
        elif c == "|":
            out.append(("or", c)); i += 1
        elif c == "+":
            out.append(("and", c)); i += 1
        elif c == "-":
            # token-INITIAL '-' (we only get here at a token boundary —
            # mid-word hyphens are consumed by the word scan below)
            out.append(("neg", c)); i += 1
        elif c == '"':
            j = query.find('"', i + 1)
            if j < 0:  # leniency: drop the quote char, reparse the tail
                query = query[:i] + query[i + 1:]
                n -= 1
                continue
            body = query[i + 1: j]
            i = j + 1
            # optional ~N slop suffix (accepted; served as exact phrase)
            if i < n and query[i] == "~":
                i += 1
                while i < n and query[i].isdigit():
                    i += 1
            out.append(("phrase", body))
        else:
            j = i
            while j < n and not query[j].isspace() and query[j] not in _WORD_STOP:
                j += 1
            out.append(("word", query[i:j]))
            i = j
    return out


def _expand_word(word: str, reader: IndexReader | None, max_expansions: int):
    """A word clause -> leaf node, resolving * / ~N through the term
    dictionary. Empty expansion -> the impossible sentinel."""
    fuzzy_edits = None
    base, sep, tail = word.partition("~")
    if sep and base and (tail == "" or tail.isdigit()):
        fuzzy_edits = min(int(tail), 2) if tail else 1
        word = base
    if word.endswith("*") and len(word) > 1 and "*" not in word[:-1]:
        if reader is None:
            return BTerm(IMPOSSIBLE)
        terms = reader.expand_prefix(word[:-1], max_terms=1 << 20)
        terms = terms[:max_expansions]
        if not terms:
            return BTerm(IMPOSSIBLE)
        leaves = tuple(BTerm(t) for t in terms)
        return leaves[0] if len(leaves) == 1 else BOr(leaves)
    if fuzzy_edits is not None:
        if reader is None:
            return BTerm(IMPOSSIBLE)
        # max_terms must out-size any realistic vocabulary neighborhood:
        # the default (1024) raises on short terms over a big vocab, which
        # would break this module's never-raises contract. Expand wide,
        # then truncate to max_expansions like the prefix path.
        terms = reader.expand_fuzzy(
            word, max_edits=fuzzy_edits, max_terms=1 << 20
        )
        terms = terms[:max_expansions]
        if not terms:
            return BTerm(IMPOSSIBLE)
        leaves = tuple(BTerm(t) for t in terms)
        return leaves[0] if len(leaves) == 1 else BOr(leaves)
    # stray specials inside the word stay literal (leniency): strip chars
    # the tree grammar reserves so the leaf can never be misparsed
    clean = word.replace("*", "").replace("~", "").replace("^", "")
    return BTerm(clean) if clean else None


def _parse_group(toks, pos, reader, max_expansions, default_and, nested):
    """Parse one group; returns (node_or_None, next_pos). Lenient.

    Positives fold left-associatively with the pending operator; negated
    clauses collect and attach to the WHOLE group as ``AND NOT`` at the
    end (the must_not-at-the-boolean-level grouping ES/Lucene apply:
    ``a -b c`` == ``(a OP c) AND NOT b``). A group with only negatives
    matches nothing. At top level (``nested=False``) a stray ``)`` is
    dropped instead of truncating the rest of the query."""
    acc: Node | None = None
    negs: list[Node] = []
    pending = "and" if default_and else "or"
    neg = False

    def fold(node: Node):
        nonlocal acc
        if acc is None:
            acc = node
        elif pending == "and":
            acc = BAnd((acc, node))
        else:
            acc = BOr((acc, node))

    i = pos
    while i < len(toks):
        kind, text = toks[i]
        if kind == "rp":
            i += 1
            if nested:
                break
            continue  # leniency: unmatched ')' at top level is dropped
        if kind == "lp":
            sub, i = _parse_group(toks, i + 1, reader, max_expansions,
                                  default_and, nested=True)
            if sub is not None:
                (negs.append(sub) if neg else fold(sub))
            neg = False
            pending = "and" if default_and else "or"
            continue
        if kind in ("or", "and"):
            pending = kind  # doubled operators: last one wins (leniency)
            i += 1
            continue
        if kind == "neg":
            neg = True
            i += 1
            continue
        if kind == "phrase":
            body = tuple(t for t in text.split() if t)
            node = (
                BPhrase(body) if len(body) >= 2
                else (BTerm(body[0]) if body else None)
            )
        else:
            node = _expand_word(text, reader, max_expansions)
        if node is not None:
            (negs.append(node) if neg else fold(node))
        neg = False
        pending = "and" if default_and else "or"
        i += 1
    if negs:
        base = acc if acc is not None else BTerm(IMPOSSIBLE)
        acc = BAnd((base,) + tuple(BNot(n) for n in negs))
    return acc, i


def parse_simple(
    query: str,
    reader: IndexReader | None = None,
    default_operator: str = "or",
    max_expansions: int = 64,
) -> Node | None:
    """Translate simple_query_string syntax into an A56 boolean tree.
    Returns None when nothing parseable remains (serve as zero hits).
    Never raises on malformed INPUT; bad ARGUMENTS still raise."""
    if default_operator not in ("or", "and"):
        raise ValueError(f"unknown default_operator {default_operator!r}")
    if max_expansions < 1:
        raise ValueError("max_expansions must be >= 1")
    node, _ = _parse_group(
        _lex(query), 0, reader, max_expansions, default_operator == "and",
        nested=False,
    )
    return node


def search_simple(
    reader: IndexReader,
    query: str,
    k: int = 10,
    default_operator: str = "or",
    max_expansions: int = 64,
    where: dict | None = None,
    round_digits: int | None = 6,
) -> list[tuple[int, float]]:
    """Serve a simple_query_string from the binary index (driver path)."""
    from miru_spark.plans.booltree import search_bool

    node = parse_simple(
        query, reader, default_operator=default_operator,
        max_expansions=max_expansions,
    )
    if node is None:
        return []
    return search_bool(
        reader, node, k=k, where=where, round_digits=round_digits
    )


def simple_oracle_sql(
    query: str,
    k: int = 10,
    round_digits: int = 6,
    default_operator: str = "or",
) -> str:
    """DuckDB twin for EXPANSION-FREE simple queries: the translated tree
    is deterministic without an index (no * / ~ clauses), so the A56 tree
    oracle generator applies directly."""
    from miru_spark.plans.booltree import bool_oracle_sql

    node = parse_simple(query, None, default_operator=default_operator)
    if node is None:
        raise ValueError("query translates to no clauses; no oracle")

    def has_impossible(n):
        # With reader=None, an IMPOSSIBLE leaf can ONLY come from an
        # unresolved * / ~ expansion clause — refusing here beats silently
        # emitting an oracle where that clause matches nothing.
        if isinstance(n, BTerm):
            return n.term == IMPOSSIBLE
        if isinstance(n, BPhrase):
            return False
        kids = n.children if isinstance(n, (BOr, BAnd)) else (n.child,)
        return any(has_impossible(c) for c in kids)

    if has_impossible(node):
        raise ValueError(
            "expansion queries (* / ~ clauses) have no static oracle"
        )
    return bool_oracle_sql(node, k=k, round_digits=round_digits)
