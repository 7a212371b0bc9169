"""Property-based parity fuzzing (hypothesis): the fast HTML tokenizer
must match the HTMLParser-based reference collector on ARBITRARY tag
soup, not just the fixture corpus, and the PDF parser must never crash
on corrupted content streams (quarantine, not exceptions).

derandomize=True: failures reproduce deterministically in CI; raise
max_examples locally when hunting.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# tag soup alphabet: words, whitespace, angle brackets, real tags (incl.
# rawtext and self-closing), comments, entities, attribute junk
_FRAGMENTS = st.sampled_from([
    "word", "longer words here", " ", "\n", "\t", "<", ">", "</", "/>",
    "<p>", "</p>", "<div>", "</div>", "<br>", "<br/>", "<a href=x>",
    "<a href=http://e.com/>", "</a>", "<script>", "</script>",
    "</scripty>", "</ script >", "<style>", "</style>", "<!-- c -->",
    "<!--", "-->", "&amp;", "&lt;", "&#65;", "&bogus;", "<svg/>",
    "<iframe>", "</iframe>", "<span>", "</span>", "<P>", "</P>",
    "<p  class=x>", "<p/>", "= 1; if (a<b) x();", "<table>", "</table>",
    "<li>", "</li>", "<h1>", "</h1>", "<!doctype html>", "<?pi ?>",
    "<p.x>", "</p.x>", "<a_b>", "</a_b>", "</a_b junk>", "<ns:tag>",
    "</ns:tag>", "</p attr>", "</ x junk>", "</3>",
])
# NUL-in-tag is excluded from the collector-level domain: html.parser
# splits tags irregularly at NULs while decode_html_bytes strips them
# before tokenizing (documented divergence in html_extract.py)


@given(st.lists(_FRAGMENTS, min_size=0, max_size=40).map("".join))
@settings(max_examples=300, derandomize=True, deadline=None)
def test_fast_tokenizer_matches_reference_on_tag_soup(html):
    from pdf_extract_spark.kernels.html_extract import (
        _collect_blocks,
        _collect_blocks_reference,
    )

    assert _collect_blocks(html) == _collect_blocks_reference(html), repr(html)


@given(st.lists(_FRAGMENTS, min_size=0, max_size=30).map("".join))
@settings(max_examples=150, derandomize=True, deadline=None)
def test_full_html_extract_matches_reference_text(html):
    """GENUINE end-to-end parity: run the full extraction once with the
    fast tokenizer and once with the HTMLParser reference collector
    swapped in underneath — extracted text must be byte-identical."""
    from pdf_extract_spark.kernels import html_extract as H

    doc = f"<html><body>{html}</body></html>"
    fast = H.extract_main_text(doc)
    orig = H._collect_blocks
    H._collect_blocks = H._collect_blocks_reference
    try:
        ref = H.extract_main_text(doc)
    finally:
        H._collect_blocks = orig
    assert fast == ref, repr(html)


_PDF_CHUNKS = st.sampled_from([
    b"%PDF-1.4\n", b"stream\n", b"endstream\n", b"BT ", b"ET\n", b"Tj\n",
    b"(text) Tj\n", b"1 0 0 1 72 720 Tm\n", b"/F1 12 Tf\n", b"TD\n",
    b"[(a) (b)] TJ\n", b"<< /Length 99 >>\n", b"obj\n", b"endobj\n",
    b"\x00\xff\xfe", b"(unclosed", b")", b"99999 0 R\n", b"xref\n",
    b"(\\041\\x)", b"[(]", b"1 1 Td\n", b"%%EOF\n",
])


@given(st.lists(_PDF_CHUNKS, min_size=1, max_size=25).map(b"".join))
@settings(max_examples=300, derandomize=True, deadline=None)
def test_pdf_parser_never_crashes_on_corrupt_streams(payload):
    """Corrupt/truncated PDF content must produce (text, None) or
    (None, error) — never an exception (quarantine discipline)."""
    from pdf_extract_spark.kernels.decode import decode_payload

    body = b"%PDF-" + payload if not payload.startswith(b"%PDF-") else payload
    text, err = decode_payload(body)
    # quarantine contract: exactly one of (text, error) is set
    assert (text is None) != (err is None), (text, err)
    # determinism
    assert decode_payload(body) == (text, err)


@given(st.sampled_from(["rc4-40", "rc4-128", "aesv2", "aesv3"]),
       st.sampled_from([None, ["/LZWDecode"],
                        ["/ASCII85Decode", "/FlateDecode"],
                        ["/RunLengthDecode"], ["/ASCIIHexDecode"]]),
       st.integers(0, 6000), st.integers(0, 255))
@settings(max_examples=200, derandomize=True, deadline=None)
def test_pdf_wild_features_never_crash_under_mutation(mode, filters,
                                                      pos, byte):
    """Single-byte mutations of VALID encrypted/filtered/form PDFs must
    quarantine or extract — never raise (the error-row contract that
    keeps one bad crawl doc from killing a 10^12-doc task). Covers the
    crypto handshake (O/U/ID bytes), ciphertext, filter streams, and
    xref machinery, wherever the mutation lands."""
    from pdf_extract_spark.fixtures import pdf_writer
    from pdf_extract_spark.kernels.decode import decode_payload

    base = pdf_writer.build_pdf2(
        [pdf_writer.page_ops_simple(["fuzzed line one", "and two"])],
        encrypt=mode, filters=filters,
        xref_stream=(pos % 2 == 0), objstm=(pos % 3 == 0))
    i = pos % len(base)
    mut = base[:i] + bytes([byte]) + base[i + 1:]
    text, err = decode_payload(mut)
    assert (text is None) != (err is None), (mode, filters, i, byte)
    assert decode_payload(mut) == (text, err)


@given(
    st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
            max_size=2000),
    st.integers(50, 500),
    st.integers(0, 49),
)
@settings(max_examples=100, derandomize=True, deadline=None)
def test_kernel_invariants_under_fuzz(text, size, overlap):
    """Chunk-size bound + determinism for every pure kernel on arbitrary
    unicode (deep local hunts ran 800 examples; CI keeps 100)."""
    from pdf_extract_spark.kernels.chunker import split_text
    from pdf_extract_spark.kernels.embed import embed_text
    from pdf_extract_spark.kernels.ner import extract_entities
    from pdf_extract_spark.kernels.summarize import summarize_extractive
    from pdf_extract_spark.kernels.textstats import (
        detect_language,
        quality_score,
        simhash64,
    )

    chunks = split_text(text, chunk_size=size, chunk_overlap=overlap)
    assert all(len(c) <= size for c in chunks)
    assert split_text(text, chunk_size=size, chunk_overlap=overlap) == chunks
    if text.strip():
        assert chunks
    assert embed_text(text[:300]).tolist() == embed_text(text[:300]).tolist()
    extract_entities(text[:300])
    summarize_extractive(text[:500])
    simhash64(text[:300])
    detect_language(text[:300])
    quality_score(text[:300])


# --- media container fuzzing ------------------------------------------------

_MEDIA_SEEDS = st.sampled_from([
    b"BM", b"P6", b"RIFF", b"YUV4MPEG2", b"MMK1", b"\x89PNG\r\n\x1a\n",
    b"P6\n3 2\n255\n", b"RIFFxxxxWAVE", b"YUV4MPEG2 W4 H2 F25:1\x0aFRAME\x0a",
])
_MEDIA_JUNK = st.binary(max_size=200)


@given(_MEDIA_SEEDS, _MEDIA_JUNK, st.integers(0, 3))
@settings(max_examples=300, derandomize=True, deadline=None)
def test_media_decoder_never_crashes(seed, junk, cut):
    """Arbitrary bytes after any container magic must decode to
    (meta, None) or (None, error) — never raise (quarantine discipline),
    and deterministically."""
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    payload = seed + junk
    if cut:
        payload = payload[:-cut] if cut < len(payload) else b""
    meta, err = decode_payload_media(payload)
    assert (meta is None) != (err is None), (meta, err)
    if meta is not None:
        assert meta["kind"] in ("image", "audio", "video")
        assert meta["width"] >= 0 and meta["height"] >= 0
    again_meta, again_err = decode_payload_media(payload)
    assert again_err == err
    if meta is not None:
        assert {k: v for k, v in again_meta.items() if k != "samples"} == \
            {k: v for k, v in meta.items() if k != "samples"}


@given(st.integers(1, 24), st.integers(1, 16), st.integers(0, 255),
       st.integers(0, 40))
@settings(max_examples=150, derandomize=True, deadline=None)
def test_media_writer_roundtrip_and_truncation(w, h, seed, cut):
    """Writer output decodes to the written dimensions for every size;
    any strict prefix either still parses (bytes cut from an ignored
    trailing region) or quarantines — never raises."""
    from pdf_extract_spark.fixtures.media import make_bmp, make_ppm, make_wav
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    for payload, kind in ((make_bmp(w, h, seed), "image"),
                          (make_ppm(w, h, seed), "image"),
                          (make_wav(8000 + seed, w * h, seed), "audio")):
        meta, err = decode_payload_media(payload)
        assert err is None, err
        assert meta["kind"] == kind
        if kind == "image":
            assert (meta["width"], meta["height"]) == (w, h)
        else:
            assert meta["n_frames"] == w * h
        if cut:
            trunc = payload[:-cut]
            m2, e2 = decode_payload_media(trunc)  # must not raise
            assert (m2 is None) != (e2 is None)


# --- BPE replace-chain encoding (queries/model_q.py) -----------------------
# The engine merges BPE pairs with ONE literal replace over the
# '|t1||t2|' token-list encoding; both engines' replace() is
# left-to-right non-overlapping, which must equal a direct greedy merge.
# Validate the encoding trick itself against a first-principles reference
# on arbitrary words and merge sequences (the oracle test proves
# Spark == DuckDB; this proves both == BPE).

def _bpe_ref_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    toks = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


_LOWER = st.text(alphabet="ab", min_size=1, max_size=12)


@given(
    word=st.text(alphabet="abc", min_size=1, max_size=16),
    pairs=st.lists(st.tuples(_LOWER, _LOWER), min_size=0, max_size=6),
)
@settings(max_examples=300, derandomize=True, deadline=None)
def test_bpe_replace_chain_equals_greedy_reference(word, pairs):
    s = "|" + "||".join(list(word)) + "|"
    for a, b in pairs:
        s = s.replace(f"|{a}||{b}|", f"|{a}{b}|")
    got = s[1:-1].split("||") if len(s) > 2 else []
    assert got == _bpe_ref_apply(word, pairs)
    assert "".join(got) == word  # merges never alter the byte content
