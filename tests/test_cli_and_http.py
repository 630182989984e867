"""CLI command tests (driven via subprocess — the real user surface) and
HTTP-provider tests with an injected fake transport (no network)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from cargo_chat_spark.models.openai_http import OpenAIHttpProvider


def _fake_transport(responses: dict):
    calls = []

    def transport(path: str, payload: dict) -> dict:
        calls.append((path, payload))
        content = responses[payload["model"]]
        return {"choices": [{"message": {"content": content}}]}

    transport.calls = calls
    return transport


def test_http_provider_classify_and_hyde():
    t = _fake_transport(
        {
            "gpt-4o-mini": json.dumps(
                {
                    "language": "rust",
                    "intent": "implementation",
                    "wants_code": True,
                    "confidence": 0.85,
                    "target_folders": ["src"],
                }
            ),
            "gpt-4o": "final answer",
        }
    )
    p = OpenAIHttpProvider(transport=t)
    cls = p.classify_query("implement a rust parser")
    assert cls.language == "rust" and cls.wants_code and cls.confidence == 0.85
    # strict JSON-schema structured output requested (hyde.rs:353-392)
    assert t.calls[0][1]["response_format"]["type"] == "json_schema"
    assert t.calls[0][1]["temperature"] == 0.1

    # HyDE respects the char budget (main.rs:497)
    t2 = _fake_transport({"gpt-4o-mini": "x" * 5000})
    p2 = OpenAIHttpProvider(transport=t2)
    assert len(p2.hyde_document("q", "explanation", 1000)) == 1000

    # embeddings fall back to the deterministic mock
    assert len(p.embed_batch(["a"])[0]) == 16


def _sse(content: str) -> str:
    return "data: " + json.dumps(
        {"choices": [{"delta": {"content": content}}]}
    ) + "\n"


def test_http_provider_streams_sse():
    """M6 streaming parity (hyde.rs:788-810): `data:` lines parse to a lazy
    token iterator, `[DONE]` ends the stream, separators/keep-alives skip."""
    calls = []
    consumed = []

    def stream_transport(path, payload):
        calls.append((path, payload))
        frames = [
            _sse("Hello"),
            "\n",                      # event separator
            ": keep-alive comment\n",  # SSE comment line
            _sse(" wor"),
            _sse("ld"),
            "data: {not json\n",       # partial frame — skipped
            "data: [DONE]\n",
            _sse("after-done never emitted"),
        ]
        for f in frames:
            consumed.append(f)
            yield f

    p = OpenAIHttpProvider(
        transport=_fake_transport({"gpt-4o": "unused"}),
        stream_transport=stream_transport,
    )
    it = p.synthesize_answer("ctx")
    # lazy: nothing consumed until the first token is pulled
    assert consumed == []
    first = next(it)
    assert first == "Hello"
    # the transport has NOT been drained past the first data frame
    assert len(consumed) <= 2
    assert list(it) == [" wor", "ld"]
    # stream request flags set per the reference client
    assert calls[0][1]["stream"] is True
    assert calls[0][1]["temperature"] == 0.0
    # stopped AT the sentinel: the post-DONE frame was never consumed
    assert "data: [DONE]\n" in consumed
    assert not any("after-done" in f for f in consumed)


def test_http_provider_requires_key(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(OSError, match="OPENAI_API_KEY"):
        OpenAIHttpProvider()


@pytest.mark.slow
def test_cli_index_query_profile(tmp_path):
    repo = tmp_path / "repo"
    (repo / "src").mkdir(parents=True)
    (repo / "src" / "main.rs").write_text("fn main() { let x = 1; }\n" * 30)
    (repo / "README.md").write_text("# Demo\nDemo repo.\n")
    (repo / "Cargo.toml").write_text("[dependencies]\nserde = \"1\"\n")
    index_dir = str(tmp_path / "idx")

    import os

    env = {**os.environ, "SPARK_GRAFT_CPUS": "4",
           "PYTHONPATH": "/root/repo"}  # executors' Python workers must
    # import cargo_chat_spark too, not just the driver process
    base = [sys.executable, "-m", "cargo_chat_spark"]
    out = subprocess.run(
        base + ["index", str(repo), index_dir],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Indexed" in out.stdout

    out = subprocess.run(
        base + ["query", index_dir, "how does the rust main function work", "-k", "3"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[classification]" in out.stdout
    assert "src/main.rs" in out.stdout

    out = subprocess.run(
        base + ["profile", str(repo)],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    prof = json.loads(out.stdout[out.stdout.index("{"):])
    assert prof["primary_languages"][0] == "Rust"
    assert "Cargo.toml" in prof["build_files"]


def test_repl_help_status_and_rerank_parse(spark, capsys, monkeypatch):
    """REPL parity (main.rs:101-120): help/status commands answer, query
    without an index warns, --use-rerank parses; loop survives bad input."""
    from cargo_chat_spark import cli

    feed = iter(["help", "status", "query what is this --use-rerank", "bogus", "exit"])
    monkeypatch.setattr("builtins.input", lambda *_: next(feed))
    cli.cmd_interactive(spark)
    out = capsys.readouterr().out
    assert out.count("cargo_chat_spark REPL") >= 2  # banner + help
    assert "index: not loaded" in out
    assert "No index loaded" in out
    assert "unknown command" in out


def test_repl_history_survives_invocations(spark, tmp_path, monkeypatch):
    """History file parity (main.rs:578-601, 611, 741-744): commands typed
    in one REPL session are reloaded into readline in the next."""
    readline = pytest.importorskip("readline")
    from cargo_chat_spark import cli

    monkeypatch.setenv("HOME", str(tmp_path))
    hist_file = tmp_path / cli.HISTORY_FILE_NAME
    readline.clear_history()

    feed = iter(["help", "status", "exit"])
    monkeypatch.setattr("builtins.input", lambda *_: next(feed))
    cli.cmd_interactive(spark)
    assert hist_file.exists(), "REPL exit did not write the history file"

    # fresh 'process': wipe in-memory history, run a second session, and
    # check the first session's commands came back from disk
    readline.clear_history()
    feed2 = iter(["exit"])
    monkeypatch.setattr("builtins.input", lambda *_: next(feed2))
    cli.cmd_interactive(spark)
    loaded = [
        readline.get_history_item(i + 1)
        for i in range(readline.get_current_history_length())
    ]
    assert "help" in loaded and "status" in loaded, (
        f"history not reloaded across invocations: {loaded}"
    )
