from nvdb_tpu.tools.embed import chunk_text


def test_chunking_respects_max_chars():
    text = ". ".join(f"Sentence number {i} with some words" for i in range(50)) + "."
    chunks = chunk_text(text, max_chars=120)
    assert all(len(c) <= 120 for c in chunks)
    # no content lost
    assert sum(len(c.replace(" ", "")) for c in chunks) >= \
        len(text.replace(" ", "")) - len(chunks) * 2


def test_chunking_hard_splits_long_sentence():
    text = "x" * 500
    chunks = chunk_text(text, max_chars=100)
    assert len(chunks) == 5 and all(len(c) <= 100 for c in chunks)


def test_chunking_empty():
    assert chunk_text("", 100) == []
    assert chunk_text("   ", 100) == []
