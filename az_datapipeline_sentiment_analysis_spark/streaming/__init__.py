"""Streaming: native incremental pipeline + windowed/stateful operators."""
