"""Differential suite for the grammar-backed P3 tier
(operators/chunking_ts.py vs the regex tier, r8 verdict item 5).

py-tree-sitter is not installable in this sandbox, so wheel-backed
differentials skip per-language — EXCEPT Python, whose stdlib-ast
grammar provider (r12 verdict item 5) is always available: the Python
rows of this suite now RUN here instead of skipping. The contract tests
(table completeness, the explicit no-grammar failure mode) always run.
Per runnable language the suite verifies: the provider satisfies the
exact split_structured contract (lossless partition, cap,
declaration-at-boundary), EQUALS the regex tier on flat fixtures, and
beats it on nested declarations (the fidelity gap the verdict names)."""

from __future__ import annotations

import pytest

from cargo_chat_spark.operators import chunking_ts as TS
from cargo_chat_spark.operators.chunking import split_structured
from tests.test_chunking import _LANG_FIXTURES


def test_provider_tables_language_complete():
    """The grammar/decl tables stay in sync with the reference language
    table (language.rs:57-72) — same completeness pin as the regex
    tier's _BOUNDARY_PATTERNS."""
    from cargo_chat_spark.functions.language import LANGUAGE_EXTENSIONS

    assert set(TS._GRAMMAR_MODULES) == set(LANGUAGE_EXTENSIONS)
    assert set(TS._DECL_TYPES) == set(LANGUAGE_EXTENSIONS)


@pytest.mark.skipif(
    TS.HAVE_TREE_SITTER, reason="tree-sitter present; failure mode N/A"
)
def test_explicit_failure_without_any_grammar():
    """Opting into the AST tier for a language with NO grammar must
    raise, never silently fall back (the caller asked for syntax
    fidelity). Since r14 EVERY reference language has a stdlib provider
    (ast / Markdown sections / brace tracker / Ruby end tracker), so
    the failure mode only fires for out-of-table languages."""
    with pytest.raises(RuntimeError, match="tree-sitter"):
        TS.split_structured_ts("fn main() {}\n", "Zig", 100)
    assert TS.get_parser("Zig") is None
    assert isinstance(TS.get_parser("Python"), TS.PythonAstParser)
    assert isinstance(TS.get_parser("Rust"), TS.CFamilyParser)
    assert isinstance(TS.get_parser("Ruby"), TS.RubyEndParser)


def test_python_stdlib_grammar_always_available():
    """The r13 closure of the wheel gap: the Python differential rows
    below run in THIS sandbox via the stdlib-ast grammar."""
    p = TS.get_parser("Python")
    assert p is not None
    tree = p.parse(b"def f():\n    pass\n")
    assert tree.root_node.type == "module"
    node = tree.root_node.named_children[0]
    assert node.type == "function_definition"
    assert node.start_point == (0, 0)


def test_python_stdlib_grammar_syntax_error_falls_back_to_window():
    """Documented stdlib-grammar divergence: unparseable source gets
    the hard char window (tree-sitter would emit a partial tree)."""
    bad = "def broken(:\n" + "x" * 50
    chunks = TS.split_structured_ts(bad, "Python", max_chars=20)
    assert "".join(chunks) == bad
    assert all(len(c) <= 20 for c in chunks)
    assert [len(c) for c in chunks[:-1]] == [20] * (len(chunks) - 1)


def _parser_or_skip(lang: str):
    p = TS.get_parser(lang)
    if p is None:
        pytest.skip(
            f"no grammar for {lang} (tree-sitter wheels not installable "
            "in this sandbox and no stdlib provider — since r14 this "
            "only happens for out-of-table languages)"
        )
    return p


@pytest.mark.parametrize("lang", sorted(_LANG_FIXTURES))
def test_ts_tier_meets_contract_and_matches_regex_on_flat_files(lang):
    """Contract: lossless, capped, second declaration at a chunk start.
    Differential: on FLAT fixtures (all declarations at top level) the
    AST boundaries coincide with the regex tier's."""
    _parser_or_skip(lang)
    first, second, marker = _LANG_FIXTURES[lang]
    text = first + second
    cap = max(len(first), len(second)) + 4
    chunks = TS.split_structured_ts(text, lang, max_chars=cap)
    assert "".join(chunks) == text, f"{lang}: lossy split"
    assert all(len(c) <= cap for c in chunks), f"{lang}: cap violated"
    assert any(c.lstrip().startswith(marker) for c in chunks), (
        f"{lang}: declaration '{marker}' not at a chunk boundary"
    )
    assert chunks == split_structured(text, lang, max_chars=cap), (
        f"{lang}: tiers diverge on a flat fixture"
    )


def test_ts_tier_splits_nested_methods():
    """The fidelity gap the AST closes: an oversized class whose methods
    are INDENTED splits between methods (reference recursion,
    chunker.rs:64-116), where the column-anchored Python regex cannot
    place a boundary."""
    _parser_or_skip("Python")
    m1 = "class Big:\n    def a(self):\n        return 1\n"
    m2 = "    def b(self):\n        return 2\n"
    text = m1 + m2
    cap = max(len(m1), len(m2)) + 4
    chunks = TS.split_structured_ts(text, "Python", max_chars=cap)
    assert "".join(chunks) == text
    assert any(c.lstrip().startswith("def b") for c in chunks), (
        "nested method not at a chunk boundary"
    )


def test_ts_tier_keeps_decorator_with_its_function():
    """decorated_definition semantics: ONE boundary at the decorator
    line — the chunk break lands before '@', never between the
    decorator and its def (where the def-anchored regex would put it)."""
    _parser_or_skip("Python")
    first = "def first():\n    return 1\n"
    deco = "@wraps(first)\ndef second():\n    return 2\n"
    text = first + deco
    cap = max(len(first), len(deco)) + 4
    chunks = TS.split_structured_ts(text, "Python", max_chars=cap)
    assert "".join(chunks) == text
    assert any(c.startswith("@wraps") for c in chunks), (
        "decorator must open the chunk"
    )
    assert not any(c.startswith("def second") for c in chunks), (
        "a boundary between decorator and def splits the envelope"
    )


def test_markdown_stdlib_grammar_always_available():
    """Markdown's stdlib provider: sections nest by heading level
    (tree-sitter-markdown's shape), so an h3 under an h2 sits at
    grammar depth 2 and does NOT open a boundary under the depth<=1
    rule, while h1/h2 do."""
    p = TS.get_parser("Markdown")
    assert isinstance(p, TS.MarkdownAstParser)
    text = "# A\nbody\n## B\nmore\n### C\ndeep\n## D\nend\n"
    chunks = TS.split_structured_ts(text, "Markdown", max_chars=12)
    assert "".join(chunks) == text
    assert any(c.startswith("## B") for c in chunks)
    assert any(c.startswith("## D") for c in chunks)
    assert not any(c.startswith("### C") for c in chunks), (
        "depth-2 section must not open a boundary"
    )


def test_markdown_ignores_headings_inside_code_fences():
    """The regex tier splits at a '# heading' INSIDE a code fence; the
    grammar tier must treat fenced content as content."""
    text = "# Real\n```\n# fake heading\n```\n# Also real\nbody\n"
    chunks = TS.split_structured_ts(text, "Markdown", max_chars=30)
    assert "".join(chunks) == text
    assert any(c.startswith("# Also real") for c in chunks)
    assert not any(c.startswith("# fake") for c in chunks), (
        "fenced pseudo-heading opened a boundary"
    )


def test_ts_tier_ignores_decl_keywords_inside_strings():
    """A string literal containing 'def ' must not open a boundary —
    the second class of regex false positives an AST removes."""
    _parser_or_skip("Python")
    text = 'X = "def fake():"\n' + "def real():\n    return 1\n"
    chunks = TS.split_structured_ts(text, "Python", max_chars=19)
    assert "".join(chunks) == text
    assert any(c.startswith("def real") for c in chunks)


def test_cfamily_nested_methods_split():
    """The fidelity gap for the brace family: methods INSIDE a class
    body (brace depth 1) open boundaries — the wheel grammar's 'one
    level down' rule — including in languages whose regex tier already
    fires on modifier lines, and in Rust impl blocks where the
    indented 'fn' is invisible to the ^-anchored pattern."""
    m1 = "impl Big {\n    fn a(&self) -> i32 {\n        1\n    }\n"
    m2 = "    fn b(&self) -> i32 {\n        2\n    }\n}\n"
    text = m1 + m2
    cap = max(len(m1), len(m2)) + 4
    chunks = TS.split_structured_ts(text, "Rust", max_chars=cap)
    assert "".join(chunks) == text
    assert any(c.lstrip().startswith("fn b") for c in chunks), (
        "nested impl method not at a chunk boundary"
    )


def test_cfamily_ignores_decls_in_strings_and_comments():
    """Masking removes the regex tier's false positives: declaration
    keywords inside string literals and comments must NOT open
    boundaries."""
    text = (
        'static S: &str = "pub fn fake() {";\n'
        "// fn also_fake() {\n"
        "/* fn block_fake() {\n   fn still_fake() { */\n"
        "fn real() -> i32 {\n    1\n}\n"
    )
    chunks = TS.split_structured_ts(text, "Rust", max_chars=60)
    assert "".join(chunks) == text
    assert any(c.startswith("fn real") for c in chunks)
    for c in chunks:
        body = c.lstrip()
        assert not body.startswith("// fn also_fake"), (
            "comment line opened a boundary"
        )
        assert not body.startswith("fn still_fake"), (
            "block-comment interior opened a boundary"
        )


def test_cfamily_multiline_signature_boundary():
    """A declaration whose body brace opens LINES after the signature
    (the C fixture shape, exaggerated): the boundary must land on the
    signature line, and the body must attach to that declaration (the
    pending-declaration state)."""
    f1 = "int first(\n    int a,\n    int b)\n{\n    return a;\n}\n"
    f2 = "void second(void)\n{\n}\n"
    text = f1 + f2
    cap = max(len(f1), len(f2)) + 4
    chunks = TS.split_structured_ts(text, "C", max_chars=cap)
    assert "".join(chunks) == text
    assert any(c.startswith("void second") for c in chunks)


def test_cfamily_rust_lifetime_not_a_string():
    """A lone single quote (Rust lifetime) must not open a string mask
    and swallow the rest of the file."""
    text = (
        "fn first<'a>(x: &'a str) -> &'a str {\n    x\n}\n"
        "pub fn second() {\n}\n"
    )
    chunks = TS.split_structured_ts(text, "Rust", max_chars=50)
    assert "".join(chunks) == text
    assert any(c.startswith("pub fn second") for c in chunks), (
        "lifetime quote swallowed the second declaration"
    )


def test_cfamily_anonymous_blocks_opaque():
    """Declarations nested inside control-flow braces sit DEEPER than
    the walk's one-level rule, exactly as with a wheel grammar: no
    boundary for a function defined inside an if body."""
    outer = (
        "function outer() {\n"
        "  if (x) {\n"
        "    function inner() {\n      return 1;\n    }\n"
        "  }\n"
        "}\n"
    )
    text = outer + "function next() {\n  return 2;\n}\n"
    chunks = TS.split_structured_ts(
        text, "JavaScript", max_chars=len(outer) + 4
    )
    assert "".join(chunks) == text
    assert any(c.startswith("function next") for c in chunks)
    assert not any(
        c.lstrip().startswith("function inner") for c in chunks
    ), "control-flow-nested declaration opened a boundary"


def test_ruby_nested_methods_split():
    """Ruby end-tracker: methods inside a class body sit one level
    down and open boundaries, like every other grammar provider."""
    m1 = "class Big\n  def a\n    1\n  end\n"
    m2 = "  def b\n    2\n  end\nend\n"
    text = m1 + m2
    cap = max(len(m1), len(m2)) + 4
    chunks = TS.split_structured_ts(text, "Ruby", max_chars=cap)
    assert "".join(chunks) == text
    assert any(c.lstrip().startswith("def b") for c in chunks), (
        "nested Ruby method not at a chunk boundary"
    )


def test_ruby_modifier_if_does_not_desync_depth():
    """The notorious Ruby trap: a MODIFIER conditional (x = 1 if y)
    has no matching end; treating it as an opener would swallow every
    later declaration. The opener rule is statement-start anchored."""
    f1 = "def first\n  x = 1 if y\n  z = 2 unless w\n  1\nend\n"
    f2 = "def second\n  2\nend\n"
    text = f1 + f2
    cap = max(len(f1), len(f2)) + 4
    chunks = TS.split_structured_ts(text, "Ruby", max_chars=cap)
    assert "".join(chunks) == text
    assert any(c.startswith("def second") for c in chunks), (
        "modifier-if desynced the end tracker"
    )


def test_ruby_ignores_decls_in_strings_and_comments():
    text = (
        's = "def fake"\n'
        "# def also_fake\n"
        "def real\n  1\nend\n"
        "class Real2\nend\n"
    )
    chunks = TS.split_structured_ts(text, "Ruby", max_chars=32)
    assert "".join(chunks) == text
    assert any(c.startswith("class Real2") for c in chunks)
    assert not any(
        c.lstrip().startswith("# def also_fake") for c in chunks
    )


def test_ruby_do_blocks_balance():
    """Iterator do-blocks consume their end without opening a
    declaration; statements after the block still split correctly."""
    f1 = "def first\n  list.each do |x|\n    puts x\n  end\n  1\nend\n"
    f2 = "def second\n  2\nend\n"
    text = f1 + f2
    cap = max(len(f1), len(f2)) + 4
    chunks = TS.split_structured_ts(text, "Ruby", max_chars=cap)
    assert "".join(chunks) == text
    assert any(c.startswith("def second") for c in chunks), (
        "do-block end consumed a declaration level"
    )
