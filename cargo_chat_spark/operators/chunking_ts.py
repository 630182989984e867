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
verified rounds 2-4 and re-verified rounds 9 and 13), so the wheel tier
is import-gated: ``HAVE_TREE_SITTER`` is False here and wheel
differentials would skip — but since round 14 EVERY reference language
has a PURE-PYTHON grammar provider: ``PythonAstParser`` (stdlib ``ast``
compiled to tree-sitter-python's node shape — same node type names,
0-based ``start_point`` rows, ``block`` body wrappers,
``decorated_definition`` envelopes, r13), ``MarkdownAstParser``
(fence-aware ATX ``section`` nesting, tree-sitter-markdown's shape,
r13), ``CFamilyParser`` (comment/string-masking lexer + brace-depth
state machine for Rust/Java/Go/C/C++/C#/JS/TS/Swift, r14 — r13 verdict
item 5), and ``RubyEndParser`` (end-keyword depth tracker, r14), so the
SAME ``_boundary_lines`` walk runs against real grammars in this
sandbox and the full 12-language differential suite executes with zero
skips.
In an environment with ``tree-sitter`` + per-language grammar wheels
(``tree-sitter-python``, ``tree-sitter-rust``, ...) the wheel provider
takes precedence with no other change — the char-window spec
(chunk_documents gate) and the boundary-fixture contract in
tests/test_chunking.py remain the acceptance gates.

Running the differential against the stdlib grammar immediately caught
a LATENT DEPTH BUG in the original (never-executable) ``_boundary_lines``:
grammar bodies are wrapped in container nodes (``block``,
``declaration_list``, ``class_body``, ...), so the walk's single
recursion level was spent on the wrapper and "one level down" never
reached the methods inside a class. Containers are now transparent
(descend without charging depth) — which is also what the wheel tier
needs for the nested-method split the suite pins.

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

# Body-wrapper node types across the 12 grammars: structural containers
# between a declaration and its member declarations. The boundary walk
# descends through these WITHOUT charging recursion depth — the depth
# budget counts declaration nesting, not grammar plumbing (the latent
# bug the stdlib-grammar differential caught; module docstring).
_CONTAINER_TYPES = {
    "block",                    # Python, Rust fn bodies
    "statement_block",          # JavaScript/TypeScript
    "compound_statement",       # C/C++
    "declaration_list",         # Rust impl/mod/trait, C++ namespace, C#
    "field_declaration_list",   # Rust/C/C++ structs
    "class_body",               # JS/TS/Java/Swift
    "interface_body",           # Java/TS
    "enum_body",                # Java/Swift
    "enum_body_declarations",   # Java
    "body_statement",           # Ruby
    "function_body",            # Swift
    "protocol_body",            # Swift
}


class _Node:
    """Minimal tree-sitter node facade: the three attributes
    ``_boundary_lines`` reads (``type``, 0-based ``start_point``,
    ``named_children``), shaped exactly like tree-sitter-python emits
    them so the wheel tier and the stdlib tier share one walk."""

    __slots__ = ("type", "start_point", "named_children")

    def __init__(self, type_, start_point, named_children=()):
        self.type = type_
        self.start_point = start_point
        self.named_children = list(named_children)


class _Tree:
    __slots__ = ("root_node",)

    def __init__(self, root_node):
        self.root_node = root_node


def _py_stmt_node(s):
    """One stdlib-ast statement -> tree-sitter-python-shaped facade
    node. Definitions become function_definition / class_definition
    with a ``block`` body wrapper; decorated definitions get the
    ``decorated_definition`` envelope starting at the first decorator
    (ast excludes decorators from the def's lineno since 3.8, exactly
    like tree-sitter's inner definition node). Other statements map to
    a generic node whose nested suites are wrapped in ``block``s, so
    defs inside a top-level ``if``/``try`` sit at the same facade depth
    as under the wheel grammar."""
    import ast

    if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        t = (
            "class_definition"
            if isinstance(s, ast.ClassDef)
            else "function_definition"
        )
        body = [_py_stmt_node(c) for c in s.body]
        block = _Node(
            "block", (s.body[0].lineno - 1, s.body[0].col_offset), body
        )
        core = _Node(t, (s.lineno - 1, s.col_offset), [block])
        if s.decorator_list:
            decs = [
                _Node("decorator", (d.lineno - 1, max(0, d.col_offset - 1)))
                for d in s.decorator_list
            ]
            first = min(d.lineno for d in s.decorator_list) - 1
            return _Node(
                "decorated_definition", (first, 0), decs + [core]
            )
        return core
    nested = []
    for attr in ("body", "orelse", "finalbody"):
        nested.extend(getattr(s, attr, None) or [])
    for h in getattr(s, "handlers", None) or []:
        nested.extend(h.body)
    for c in getattr(s, "cases", None) or []:  # ast.Match stores bodies
        nested.extend(c.body)                   # under .cases[i].body
    children = []
    if nested:
        children = [
            _Node(
                "block",
                (nested[0].lineno - 1, nested[0].col_offset),
                [_py_stmt_node(c) for c in nested],
            )
        ]
    return _Node(
        "expression_statement", (s.lineno - 1, s.col_offset), children
    )


class PythonAstParser:
    """Pure-Python 'grammar wheel' for Python: stdlib ``ast`` compiled
    to the tree-sitter node shape, so the grammar-vs-spec differential
    runs in sandboxes where py-tree-sitter cannot install. One
    documented divergence: tree-sitter is error-tolerant (partial trees
    with ERROR nodes) while ``ast.parse`` raises ``SyntaxError`` —
    callers fall back to the hard char window for unparseable source."""

    def parse(self, src: bytes) -> _Tree:
        import ast

        mod = ast.parse(src.decode("utf-8"))
        return _Tree(
            _Node("module", (0, 0), [_py_stmt_node(s) for s in mod.body])
        )


class MarkdownAstParser:
    """Pure-Python 'grammar wheel' for Markdown: ATX sections compiled
    to tree-sitter-markdown's shape (``document`` root, nested
    ``section`` nodes — a lower-level heading's section nests inside
    the enclosing higher-level one — each starting at its
    ``atx_heading`` line). Fence-aware: headings inside ``` / ~~~ code
    fences are CONTENT, not boundaries — the class of regex false
    positive the grammar tier exists to remove."""

    _HEADING = None  # compiled lazily; avoids import-time re cost

    def parse(self, src: bytes) -> _Tree:
        import re

        if MarkdownAstParser._HEADING is None:
            MarkdownAstParser._HEADING = re.compile(r"^(#{1,6})\s")
        heading = MarkdownAstParser._HEADING
        lines = src.decode("utf-8").split("\n")
        root = _Node("document", (0, 0), [])
        stack: list[tuple[int, _Node]] = [(0, root)]
        # Open fence state: (char, run_length) or None. CommonMark (and
        # tree-sitter-markdown) close a fence only on a run of the SAME
        # character at least as long as the opener; a literal ~~~ line
        # inside a ``` block is content, not a toggle.
        fence: tuple[str, int] | None = None
        for idx, ln in enumerate(lines):
            stripped = ln.lstrip()
            if stripped[:1] in ("`", "~") and (
                stripped.startswith("```") or stripped.startswith("~~~")
            ):
                ch = stripped[0]
                run = len(stripped) - len(stripped.lstrip(ch))
                if fence is None:
                    fence = (ch, run)
                elif ch == fence[0] and run >= fence[1]:
                    fence = None
                continue
            if fence is not None:
                continue
            m = heading.match(ln)
            if not m:
                continue
            level = len(m.group(1))
            node = _Node(
                "section", (idx, 0), [_Node("atx_heading", (idx, 0))]
            )
            while stack[-1][0] >= level:
                stack.pop()
            stack[-1][1].named_children.append(node)
            stack.append((level, node))
        return _Tree(root)


# ---------------------------------------------------------------- C family
# Per-language declaration rules for the brace-structured languages:
# (compiled-on-demand regex over MASKED lines, tree-sitter node type).
# First match wins. The regexes deliberately mirror the regex tier's
# _BOUNDARY_PATTERNS keyword sets so the two tiers agree on flat files;
# the grammar tier wins where line regexes cannot see structure —
# declarations inside strings/comments (masked away here), nested
# members (brace-depth tracking), multi-line signatures (the pending-
# declaration state survives until its body brace opens).
_CFAMILY_RULES: dict[str, list[tuple[str, str]]] = {
    "Rust": [
        (r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:unsafe\s+|async\s+|const\s+|extern\s+\S+\s+)*fn\b",
         "function_item"),
        (r"^\s*(?:pub(?:\([^)]*\))?\s+)?struct\b", "struct_item"),
        (r"^\s*(?:pub(?:\([^)]*\))?\s+)?enum\b", "enum_item"),
        (r"^\s*(?:unsafe\s+)?impl\b", "impl_item"),
        (r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:unsafe\s+)?trait\b", "trait_item"),
        (r"^\s*(?:pub(?:\([^)]*\))?\s+)?mod\b", "mod_item"),
    ],
    "Java": [
        (r"^\s*(?:@\w+(?:\([^)]*\))?\s+)*(?:(?:public|private|protected|static|final|abstract|sealed|strictfp)\s+)*class\s+\w",
         "class_declaration"),
        (r"^\s*(?:@\w+(?:\([^)]*\))?\s+)*(?:(?:public|private|protected|static|abstract)\s+)*interface\s+\w",
         "interface_declaration"),
        (r"^\s*(?:@\w+(?:\([^)]*\))?\s+)*(?:(?:public|private|protected|static)\s+)*enum\s+\w",
         "enum_declaration"),
        (r"^\s*(?:@\w+(?:\([^)]*\))?\s+)*(?:(?:public|private|protected|static|final|abstract|synchronized|native|default)\s+)+[\w<>\[\],\s\.]*\(",
         "method_declaration"),
    ],
    "Go": [
        (r"^func\s+\(", "method_declaration"),
        (r"^func\b", "function_declaration"),
        (r"^type\b", "type_declaration"),
        (r"^var\b", "var_declaration"),
        (r"^const\b", "const_declaration"),
    ],
    "C": [
        (r"^\s*(?:typedef\s+)?struct\b", "struct_specifier"),
        (r"^\s*(?:typedef\s+)?enum\b", "enum_specifier"),
        (r"^\w[\w\s\*]*\([^;]*$", "function_definition"),
    ],
    "C++": [
        (r"^\s*(?:inline\s+)?namespace\b", "namespace_definition"),
        (r"^\s*(?:template\s*<[^>]*>\s*)?class\b", "class_specifier"),
        (r"^\s*(?:typedef\s+)?struct\b", "struct_specifier"),
        (r"^\w[\w\s\*:<>~&]*\([^;]*$", "function_definition"),
    ],
    "C#": [
        (r"^\s*(?:(?:public|private|protected|internal|static|sealed|abstract|partial)\s+)*namespace\b",
         "namespace_declaration"),
        (r"^\s*(?:(?:public|private|protected|internal|static|sealed|abstract|partial)\s+)*class\s+\w",
         "class_declaration"),
        (r"^\s*(?:(?:public|private|protected|internal|partial)\s+)*interface\s+\w",
         "interface_declaration"),
        (r"^\s*(?:(?:public|private|protected|internal|readonly|partial)\s+)*struct\s+\w",
         "struct_declaration"),
        (r"^\s*(?:(?:public|private|protected|internal)\s+)*enum\s+\w",
         "enum_declaration"),
        (r"^\s*(?:(?:public|private|protected|internal|static|sealed|abstract|virtual|override|async|partial)\s+)+[\w<>\[\],\s\.\?]*\(",
         "method_declaration"),
    ],
    "JavaScript": [
        (r"^\s*export\b", "export_statement"),
        (r"^\s*(?:async\s+)?function\b", "function_declaration"),
        (r"^\s*class\b", "class_declaration"),
        (r"^\s*const\s+\w+\s*=", "lexical_declaration"),
        (r"^\s*(?!if\b|for\b|while\b|switch\b|catch\b|do\b|else\b|return\b|new\b|typeof\b)(?:static\s+)?(?:async\s+)?(?:get\s+|set\s+)?[\w$]+\s*\([^;{}]*\)\s*\{",
         "method_definition"),
    ],
    "TypeScript": [
        (r"^\s*export\b", "export_statement"),
        (r"^\s*(?:async\s+)?function\b", "function_declaration"),
        (r"^\s*(?:abstract\s+)?class\b", "class_declaration"),
        (r"^\s*interface\b", "interface_declaration"),
        (r"^\s*type\s+\w+", "type_alias_declaration"),
        (r"^\s*(?:const\s+)?enum\b", "enum_declaration"),
        (r"^\s*namespace\b", "module"),
        (r"^\s*const\s+\w+\s*=", "lexical_declaration"),
        (r"^\s*(?!if\b|for\b|while\b|switch\b|catch\b|do\b|else\b|return\b|new\b|typeof\b)(?:static\s+)?(?:async\s+)?(?:get\s+|set\s+)?(?:public\s+|private\s+|protected\s+|readonly\s+)*[\w$]+\s*\([^;{}]*\)\s*\{",
         "method_definition"),
    ],
    "Swift": [
        (r"^\s*(?:@\w+\s+)*(?:(?:public|private|internal|open|final|fileprivate|static|override)\s+)*func\b",
         "function_declaration"),
        # tree-sitter-swift folds class/struct/enum/actor into ONE
        # class_declaration node type — mirrored here so struct/enum
        # members and boundaries behave like the wheel grammar
        (r"^\s*(?:@\w+\s+)*(?:(?:public|private|internal|open|final|fileprivate)\s+)*(?:class|struct|enum|actor)\b",
         "class_declaration"),
        (r"^\s*(?:@\w+\s+)*(?:(?:public|private|internal|open)\s+)*protocol\b",
         "protocol_declaration"),
        (r"^\s*(?:@\w+\s+)*(?:(?:public|private|internal|open)\s+)*extension\b",
         "extension_declaration"),
    ],
}

# declaration node type -> its body-container node type (the wheel
# grammar's wrapper between a declaration and its members; every value
# is in _CONTAINER_TYPES so the walk descends transparently)
_CFAMILY_CONTAINERS: dict[str, dict[str, str]] = {
    "Rust": {
        "function_item": "block",
        "struct_item": "field_declaration_list",
        "enum_item": "field_declaration_list",
        "impl_item": "declaration_list",
        "trait_item": "declaration_list",
        "mod_item": "declaration_list",
    },
    "Java": {
        "class_declaration": "class_body",
        "interface_declaration": "interface_body",
        "enum_declaration": "enum_body",
        "method_declaration": "block",
    },
    "Go": {},  # every Go body is a block
    "C": {
        "function_definition": "compound_statement",
        "struct_specifier": "field_declaration_list",
        "enum_specifier": "field_declaration_list",
    },
    "C++": {
        "function_definition": "compound_statement",
        "class_specifier": "field_declaration_list",
        "struct_specifier": "field_declaration_list",
        "namespace_definition": "declaration_list",
    },
    "C#": {
        "method_declaration": "block",
    },
    "JavaScript": {
        "class_declaration": "class_body",
        "function_declaration": "statement_block",
        "method_definition": "statement_block",
        "export_statement": "statement_block",
        "lexical_declaration": "statement_block",
    },
    "TypeScript": {
        "class_declaration": "class_body",
        "interface_declaration": "interface_body",
        "enum_declaration": "enum_body",
        "function_declaration": "statement_block",
        "method_definition": "statement_block",
        "export_statement": "statement_block",
        "module": "statement_block",
        "lexical_declaration": "statement_block",
    },
    "Swift": {
        "function_declaration": "function_body",
        "class_declaration": "class_body",
        "protocol_declaration": "protocol_body",
        "extension_declaration": "class_body",
    },
}
_CFAMILY_DEFAULT_CONTAINER = {"Go": "block", "C#": "declaration_list"}


class CFamilyParser:
    """Pure-Python 'grammar wheel' for the brace-structured languages
    (Rust/Java/Go/C/C++/C#/JavaScript/TypeScript/Swift): a comment- and
    string-aware lexer plus a brace-depth state machine, compiled to
    the tree-sitter node shape so the SAME ``_boundary_lines`` walk
    runs against it (the PythonAstParser move, r13, extended to the C
    family per the r13 verdict item 5).

    What it sees that line regexes cannot: declaration keywords inside
    strings and comments (masked before matching), nested member
    declarations (attached one brace level down, where the wheel
    grammar puts them), and multi-line signatures (a matched
    declaration stays PENDING until its body brace opens, so the
    boundary lands on the signature line even when ``{`` is lines
    later). Error-tolerant like tree-sitter: unbalanced braces clamp,
    nothing raises.

    Documented divergences from the wheel grammars (line granularity by
    design — the walk is line-based): one declaration per line;
    multi-line double-quoted strings close at end-of-line (Rust raw
    strings spanning lines may leak); single quotes mask only when they
    close on the same line (so Rust lifetimes stay plain text)."""

    __slots__ = ("language", "_rules")

    def __init__(self, language: str):
        import re

        self.language = language
        self._rules = [
            (re.compile(rx), ntype)
            for rx, ntype in _CFAMILY_RULES[language]
        ]

    def _mask(self, text: str) -> str:
        """Blank out comments and string/char literals (newlines kept,
        every other position preserved) so declaration regexes and the
        brace counter only see code."""
        lang = self.language
        backtick = lang in ("JavaScript", "TypeScript", "Go")
        out: list[str] = []
        i, n = 0, len(text)
        state: str | None = None
        while i < n:
            ch = text[i]
            if state == "block_comment":
                if ch == "*" and i + 1 < n and text[i + 1] == "/":
                    out.append("  ")
                    i += 2
                    state = None
                else:
                    out.append("\n" if ch == "\n" else " ")
                    i += 1
                continue
            if state == "backtick":
                if ch == "`":
                    state = None
                out.append("\n" if ch == "\n" else " ")
                i += 1
                continue
            if state == "dquote":
                if ch == "\\" and i + 1 < n:
                    out.append("  ")
                    i += 2
                elif ch == '"':
                    out.append(" ")
                    state = None
                    i += 1
                elif ch == "\n":  # unterminated: close at EOL (divergence note)
                    out.append("\n")
                    state = None
                    i += 1
                else:
                    out.append(" ")
                    i += 1
                continue
            if ch == "/" and i + 1 < n and text[i + 1] == "/":
                j = text.find("\n", i)
                j = n if j < 0 else j
                out.append(" " * (j - i))
                i = j
                continue
            if ch == "/" and i + 1 < n and text[i + 1] == "*":
                out.append("  ")
                i += 2
                state = "block_comment"
                continue
            if ch == '"':
                out.append(" ")
                i += 1
                state = "dquote"
                continue
            if ch == "`" and backtick:
                out.append(" ")
                i += 1
                state = "backtick"
                continue
            if ch == "'":
                # mask only a SAME-LINE-closing literal; a lone quote
                # (Rust lifetime 'a) stays plain text
                j = i + 1
                closed = -1
                while j < n and text[j] != "\n":
                    if text[j] == "\\":
                        j += 2
                        continue
                    if text[j] == "'":
                        closed = j
                        break
                    j += 1
                if closed > 0:
                    out.append(" " * (closed - i + 1))
                    i = closed + 1
                else:
                    out.append(ch)
                    i += 1
                continue
            out.append(ch)
            i += 1
        return "".join(out)

    def parse(self, src: bytes) -> _Tree:
        text = src.decode("utf-8")
        masked = self._mask(text)
        containers = _CFAMILY_CONTAINERS[self.language]
        default_container = _CFAMILY_DEFAULT_CONTAINER.get(
            self.language, "declaration_list"
        )
        root = _Node("translation_unit", (0, 0), [])
        # (children list collecting declarations, brace depth it opened at)
        stack: list[tuple[list, int]] = [(root.named_children, 0)]
        depth = 0
        pending: tuple[_Node, str, int] | None = None
        for idx, ln in enumerate(masked.split("\n")):
            for rx, ntype in self._rules:
                if rx.match(ln):
                    col = len(ln) - len(ln.lstrip())
                    node = _Node(ntype, (idx, col), [])
                    stack[-1][0].append(node)
                    pending = (node, ntype, depth)
                    break
            for cidx, ch in enumerate(ln):
                if ch == "{":
                    depth += 1
                    if pending is not None and depth == pending[2] + 1:
                        ctype = containers.get(pending[1], default_container)
                        cont = _Node(ctype, (idx, cidx), [])
                        pending[0].named_children.append(cont)
                        stack.append((cont.named_children, depth))
                        pending = None
                    else:
                        # anonymous block (if/for/match bodies, struct
                        # literals): OPAQUE — declarations inside sit
                        # deeper than the wheel walk looks, exactly as
                        # with a real grammar
                        anon = _Node("_anon_block", (idx, cidx), [])
                        stack[-1][0].append(anon)
                        stack.append((anon.named_children, depth))
                elif ch == "}":
                    depth = max(0, depth - 1)
                    while len(stack) > 1 and depth < stack[-1][1]:
                        stack.pop()
        return _Tree(root)


# ------------------------------------------------------------------ Ruby
# Ruby is the one reference language that is neither brace-structured
# nor stdlib-parsable, so it gets its own end-tracker: def/class/module
# open declaration nodes (tree-sitter-ruby's method/class/module types
# with body_statement containers), statement-start control keywords and
# end-of-line ``do`` open OPAQUE anonymous blocks, and standalone
# ``end`` tokens pop — the same depth discipline as CFamilyParser, so
# the shared walk sees class members one level down.
_RUBY_OPENER = None  # compiled lazily
_RUBY_DO = None
_RUBY_END = None


class RubyEndParser:
    """Pure-Python 'grammar wheel' for Ruby: comment/string-masking +
    an end-keyword depth tracker compiled to the tree-sitter node shape
    (``method``/``class``/``module`` + ``body_statement`` wrappers).

    Line-granularity approximations (documented divergences from the
    wheel grammar): modifier conditionals never open blocks (the
    opener rule is statement-start anchored — the notorious
    ``x = 1 if y`` case is handled); multi-line strings close at
    end-of-line; heredocs and regex literals are not masked; multiple
    statements per line process openers before ``end`` tokens."""

    def _mask(self, text: str) -> str:
        out: list[str] = []
        in_block_comment = False
        for ln in text.split("\n"):
            if in_block_comment:
                out.append(" " * len(ln))
                if ln.startswith("=end"):
                    in_block_comment = False
                continue
            if ln.startswith("=begin"):
                in_block_comment = True
                out.append(" " * len(ln))
                continue
            buf = []
            quote: str | None = None
            i, n = 0, len(ln)
            while i < n:
                ch = ln[i]
                if quote is not None:
                    if ch == "\\" and i + 1 < n:
                        buf.append("  ")
                        i += 2
                        continue
                    if ch == quote:
                        quote = None
                    buf.append(" ")
                    i += 1
                    continue
                if ch in "\"'":
                    quote = ch
                    buf.append(" ")
                    i += 1
                    continue
                if ch == "#":  # comment to EOL (interpolation #{..} only
                    buf.append(" " * (n - i))  # occurs inside strings,
                    break                      # already masked)
                buf.append(ch)
                i += 1
            out.append("".join(buf))
        return "\n".join(out)

    def parse(self, src: bytes) -> _Tree:
        import re

        global _RUBY_OPENER, _RUBY_DO, _RUBY_END
        if _RUBY_OPENER is None:
            _RUBY_OPENER = re.compile(
                r"^\s*(def|class|module|if|unless|while|until|case|begin|for)\b"
            )
            _RUBY_DO = re.compile(r"\bdo(\s*\|[^|]*\|)?\s*$")
            _RUBY_END = re.compile(r"(?<![:.\w])end\b")
        decl_map = {"def": "method", "class": "class", "module": "module"}
        root = _Node("program", (0, 0), [])
        # (children list, nesting level it opened at)
        stack: list[tuple[list, int]] = [(root.named_children, 0)]
        level = 0
        text = src.decode("utf-8")
        for idx, ln in enumerate(self._mask(text).split("\n")):
            m = _RUBY_OPENER.match(ln)
            if m:
                kw = m.group(1)
                level += 1
                col = len(ln) - len(ln.lstrip())
                if kw in decl_map:
                    node = _Node(decl_map[kw], (idx, col), [])
                    body = _Node("body_statement", (idx, col), [])
                    node.named_children.append(body)
                    stack[-1][0].append(node)
                    stack.append((body.named_children, level))
                else:
                    anon = _Node("_anon_block", (idx, col), [])
                    stack[-1][0].append(anon)
                    stack.append((anon.named_children, level))
            if _RUBY_DO.search(ln) and not (m and m.group(1) == "for"):
                level += 1
                anon = _Node("_anon_block", (idx, 0), [])
                stack[-1][0].append(anon)
                stack.append((anon.named_children, level))
            for _ in _RUBY_END.findall(ln):
                level = max(0, level - 1)
                while len(stack) > 1 and level < stack[-1][1]:
                    stack.pop()
        return _Tree(root)


def get_parser(language: str):
    """Parser for a display-name language, or None when no grammar is
    available. Wheel grammars win when importable; Python and Markdown
    additionally have always-available stdlib providers. Cached per
    language — the per-executor splitter cache of chunker.rs:64-74."""
    if language in _PARSER_CACHE:
        return _PARSER_CACHE[language]
    parser = None
    mod_name = _GRAMMAR_MODULES.get(language)
    if HAVE_TREE_SITTER and mod_name:
        try:
            import importlib

            mod = importlib.import_module(mod_name)
            from tree_sitter import Language, Parser

            lang = Language(mod.language())
            parser = Parser(lang)
        except Exception:
            parser = None
    if parser is None and language == "Python":
        parser = PythonAstParser()
    if parser is None and language == "Markdown":
        parser = MarkdownAstParser()
    if parser is None and language in _CFAMILY_RULES:
        parser = CFamilyParser(language)
    if parser is None and language == "Ruby":
        parser = RubyEndParser()
    _PARSER_CACHE[language] = parser
    return parser


def _boundary_lines(tree, decl_types: set[str]) -> list[int]:
    """0-based start LINES of declaration nodes at declaration depth
    <= 1 (top level, plus one level down). Body containers
    (_CONTAINER_TYPES) are transparent. A decorated_definition opens
    ONE boundary at its decorator line — the wrapped definition must
    not open a second one between the decorator and the def/class line,
    but its members still count as one level down. Line granularity
    (not byte) keeps pieces line-aligned like the regex tier, so the
    two tiers are comparable chunk-for-chunk."""
    lines: set[int] = set()
    root = tree.root_node
    stack = [(child, 0) for child in root.named_children]
    while stack:
        node, depth = stack.pop()
        t = node.type
        if t in _CONTAINER_TYPES:
            stack.extend((c, depth) for c in node.named_children)
            continue
        if t in decl_types:
            lines.add(node.start_point[0])
        if t == "decorated_definition":
            if depth == 0:
                for c in node.named_children:
                    if c.type in decl_types or c.type.endswith(
                        ("_definition", "_declaration", "_item")
                    ):
                        stack.extend((g, 1) for g in c.named_children)
            continue
        if depth == 0:
            stack.extend((c, 1) for c in node.named_children)
    return sorted(lines)


def split_structured_ts(
    text: str, language: str | None, max_chars: int
) -> list[str]:
    """Grammar-backed ``split_structured``: identical contract, AST
    boundaries. Falls back to the char window for unknown grammars
    (same rule as the regex tier's unknown-language branch) and for
    source the stdlib grammar cannot parse; raises RuntimeError when NO
    grammar exists for the language at all (tree-sitter missing and no
    stdlib provider) so a caller cannot silently get non-AST chunks
    after opting into this tier."""
    parser = get_parser(language or "")
    if parser is None:
        if not HAVE_TREE_SITTER:
            raise RuntimeError(
                "tree-sitter is not installed and no stdlib grammar "
                f"covers {language!r}; use "
                "operators.chunking.split_structured (the regex tier)"
            )
        return [
            text[i : i + max_chars] for i in range(0, len(text), max_chars)
        ]
    src = text.encode("utf-8")
    try:
        tree = parser.parse(src)
    except SyntaxError:
        # stdlib-grammar divergence (PythonAstParser docstring):
        # tree-sitter tolerates broken source, ast.parse does not
        return [
            text[i : i + max_chars] for i in range(0, len(text), max_chars)
        ]
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
