"""Optional tree-sitter boundary provider for P3 (r8 verdict item 1).

The reference's chunker is tree-sitter-backed (chunker.rs:64-116,
splitter config :68-70): chunk boundaries fall at SYNTAX-node starts,
so nested declarations and mid-function splits land where a parser —
not a line regex — says they do. This module is the grammar-backed tier
behind the exact ``split_structured`` contract
(operators/chunking.py:89): ``(text, language, max_chars) -> list[str]``
with the same merge-forward + hard-wrap assembly (``merge_pieces`` is
shared, so the two tiers differ ONLY in boundary placement).

py-tree-sitter is NOT installable in this sandbox (no network installs,
verified rounds 2-4 and re-verified round 9), so everything is
import-gated: ``HAVE_TREE_SITTER`` is False here, the provider raises
``RuntimeError`` if called without the libs, and the differential suite
(tests/test_chunking_ts.py) skips. In an environment with
``tree-sitter`` + per-language grammar wheels (``tree-sitter-python``,
``tree-sitter-rust``, ...) the provider activates with no other change
— the char-window spec (chunk_documents gate) and the boundary-fixture
contract in tests/test_chunking.py remain the acceptance gates.

Boundary rule (mirrors the reference's "split at semantic levels,
highest level that fits" — text-splitter's CodeSplitter semantics,
chunker.rs:68-70, simplified to one level): a boundary opens at the
start line of every DECLARATION-typed node at nesting depth <= 1 (top
level, plus one level down so impl/class bodies split per method, which
is what the reference's recursive splitter does for oversized nodes).
Pieces between boundaries then merge forward under max_chars exactly
like the regex tier.
"""

from __future__ import annotations

from cargo_chat_spark.operators.chunking import merge_pieces

try:  # pragma: no cover - exercised only where the wheels exist
    import tree_sitter  # noqa: F401

    HAVE_TREE_SITTER = True
except ImportError:
    HAVE_TREE_SITTER = False

# language display name (language.rs:57-72 table) -> grammar wheel module
_GRAMMAR_MODULES = {
    "Rust": "tree_sitter_rust",
    "Python": "tree_sitter_python",
    "JavaScript": "tree_sitter_javascript",
    "TypeScript": "tree_sitter_typescript",
    "Java": "tree_sitter_java",
    "Go": "tree_sitter_go",
    "C": "tree_sitter_c",
    "C++": "tree_sitter_cpp",
    "Ruby": "tree_sitter_ruby",
    "C#": "tree_sitter_c_sharp",
    "Swift": "tree_sitter_swift",
    "Markdown": "tree_sitter_markdown",
}

# node types that OPEN a chunk boundary, per grammar. Deliberately the
# declaration kinds the regex tier aims at (chunking._BOUNDARY_PATTERNS),
# so the two tiers agree on flat files and differ only where regexes
# cannot see structure (strings/comments that look like declarations,
# multi-line signatures, nested declarations).
_DECL_TYPES = {
    "Rust": {
        "function_item", "struct_item", "enum_item", "impl_item",
        "trait_item", "mod_item",
    },
    "Python": {"function_definition", "class_definition",
               "decorated_definition"},
    "JavaScript": {"function_declaration", "class_declaration",
                   "lexical_declaration", "export_statement",
                   "method_definition"},
    "TypeScript": {"function_declaration", "class_declaration",
                   "interface_declaration", "type_alias_declaration",
                   "enum_declaration", "module", "export_statement",
                   "method_definition"},
    "Java": {"class_declaration", "interface_declaration",
             "enum_declaration", "method_declaration",
             "constructor_declaration"},
    "Go": {"function_declaration", "method_declaration",
           "type_declaration", "var_declaration", "const_declaration"},
    "C": {"function_definition", "struct_specifier", "enum_specifier"},
    "C++": {"function_definition", "class_specifier", "struct_specifier",
            "namespace_definition"},
    "Ruby": {"method", "class", "module"},
    "C#": {"class_declaration", "interface_declaration",
           "struct_declaration", "enum_declaration",
           "namespace_declaration", "method_declaration"},
    "Swift": {"function_declaration", "class_declaration",
              "protocol_declaration", "extension_declaration"},
    "Markdown": {"section", "atx_heading"},
}

_PARSER_CACHE: dict = {}


def get_parser(language: str):
    """Parser for a display-name language, or None when the grammar
    wheel (or tree-sitter itself) is absent. Cached per language — the
    per-executor splitter cache of chunker.rs:64-74."""
    if not HAVE_TREE_SITTER:
        return None
    if language in _PARSER_CACHE:
        return _PARSER_CACHE[language]
    parser = None
    mod_name = _GRAMMAR_MODULES.get(language)
    if mod_name:
        try:
            import importlib

            mod = importlib.import_module(mod_name)
            from tree_sitter import Language, Parser

            lang = Language(mod.language())
            parser = Parser(lang)
        except Exception:
            parser = None
    _PARSER_CACHE[language] = parser
    return parser


def _boundary_lines(tree, decl_types: set[str]) -> list[int]:
    """0-based start LINES of declaration nodes at depth <= 1. Line
    granularity (not byte) keeps pieces line-aligned like the regex
    tier, so the two tiers are comparable chunk-for-chunk."""
    lines: set[int] = set()
    root = tree.root_node
    stack = [(child, 0) for child in root.named_children]
    while stack:
        node, depth = stack.pop()
        if node.type in decl_types:
            lines.add(node.start_point[0])
        if depth == 0:
            stack.extend((c, 1) for c in node.named_children)
    return sorted(lines)


def split_structured_ts(
    text: str, language: str | None, max_chars: int
) -> list[str]:
    """Grammar-backed ``split_structured``: identical contract, AST
    boundaries. Falls back to the char window for unknown/absent
    grammars (same rule as the regex tier's unknown-language branch);
    raises RuntimeError when tree-sitter itself is missing so a caller
    cannot silently get non-AST chunks after opting into this tier."""
    if not HAVE_TREE_SITTER:
        raise RuntimeError(
            "tree-sitter is not installed; use "
            "operators.chunking.split_structured (the regex tier)"
        )
    parser = get_parser(language or "")
    if parser is None:
        return [
            text[i : i + max_chars] for i in range(0, len(text), max_chars)
        ]
    src = text.encode("utf-8")
    tree = parser.parse(src)
    bounds = _boundary_lines(tree, _DECL_TYPES.get(language or "", set()))
    # \n-only split: tree-sitter rows count only \n line breaks, but
    # splitlines(keepends=True) also splits on \x0b \x0c \x85
    #   — that would misalign boundary indices in files containing
    # those characters. Reconstruct lines exactly as the parser counts
    # them (every element but the last carries its trailing \n).
    raw = text.split("\n")
    lines = [ln + "\n" for ln in raw[:-1]]
    if raw[-1]:
        lines.append(raw[-1])
    pieces: list[str] = []
    cur = ""
    for i, ln in enumerate(lines):
        if i in bounds and cur.strip():
            pieces.append(cur)
            cur = ln
        else:
            cur += ln
    if cur:
        pieces.append(cur)
    return merge_pieces(pieces, max_chars)
