"""DOM tokenizer + main-content heuristics on the hairy-HTML corners."""

from paddleocr_spark.kernels.html import (
    MIN_BLOCK_CHARS,
    main_content,
    tokenize,
)

ARTICLE = ("The quick brown fox jumps over the lazy dog while the "
           "band plays on in the background.")
PARA2 = ("A second paragraph long enough to clear the minimum block "
         "length threshold easily.")


def test_basic_extraction():
    html = (f"<html><head><title>My Page</title>"
            f"<style>p {{ color: red; }}</style></head>"
            f"<body><nav><a href='/'>Home</a> <a href='/x'>X</a></nav>"
            f"<p>{ARTICLE}</p><p>{PARA2}</p>"
            f"<footer>Copyright 2026 all rights reserved forever"
            f"</footer></body></html>")
    r = main_content(html)
    assert r["title"] == "My Page"
    assert r["main_text"] == f"{ARTICLE}\n\n{PARA2}"
    assert r["n_blocks_kept"] == 2
    # nav/footer subtrees never even reach the block scorer
    assert "Home" not in r["main_text"]
    assert "Copyright" not in r["main_text"]


def test_link_density_drops_link_farm():
    links = " ".join(f"<a href='/{i}'>related article number {i}</a>"
                     for i in range(8))
    html = f"<body><p>{ARTICLE}</p><div>{links}</div></body>"
    r = main_content(html)
    assert r["main_text"] == ARTICLE
    assert r["n_blocks_dropped"] == 1


def test_short_block_dropped_and_threshold_boundary():
    short = "x" * (MIN_BLOCK_CHARS - 1)
    exact = "y" * MIN_BLOCK_CHARS
    r = main_content(f"<body><p>{short}</p><p>{exact}</p></body>")
    assert r["main_text"] == exact
    assert r["n_blocks_dropped"] == 1


def test_script_with_angle_brackets_and_comment_with_tags():
    html = (f"<body><script>if (a < b) {{ document.write('<p>js</p>') }}"
            f"</script><!-- <p>ghost paragraph</p> -->"
            f"<p>{ARTICLE}</p></body>")
    r = main_content(html)
    assert r["main_text"] == ARTICLE
    assert "js" not in r["main_text"]
    assert "ghost" not in r["main_text"]


def test_entities_attrs_void_and_self_closing():
    html = (f'<body><p data-x="a > b" class=\'q\'>Tom &amp; Jerry say '
            f'&quot;hi&quot; &#65;&#x42; and more words to pass the '
            f'length bar<br/>second line</p><img src="x.png"/></body>')
    r = main_content(html)
    assert 'Tom & Jerry say "hi" AB' in r["main_text"]
    # <br> is a space, not a block boundary
    assert "bar second line" in r["main_text"]


def test_unclosed_p_and_h1_title_fallback():
    html = (f"<body><h1>Fallback Title</h1><p>{ARTICLE}<p>{PARA2}"
            f"</body>")
    r = main_content(html)
    assert r["title"] == "Fallback Title"
    # both paragraphs recovered despite missing </p>
    assert ARTICLE in r["main_text"] and PARA2 in r["main_text"]


def test_nested_drop_tags_and_stray_lt():
    html = (f"<body><nav><div><a href='/'>deep nav</a></div></nav>"
            f"<p>{ARTICLE} 2 < 3 holds</p></body>")
    r = main_content(html)
    assert "deep nav" not in r["main_text"]
    assert "2 < 3 holds" in r["main_text"]


def test_tokenizer_unterminated_rawtext():
    toks = list(tokenize("<p>hello</p><script>var x = 1"))
    assert ("text", "var x = 1") in toks
    assert toks[-1] == ("close", "script")


def test_whole_document_link_density_diagnostic():
    html = (f"<body><p>{ARTICLE}</p>"
            f"<p><a href='/'>{'link text here ' * 5}</a></p></body>")
    r = main_content(html)
    assert 0.0 < r["link_density"] < 1.0


# --- robustness: at 10^12 docs the parser sees every malformed page
# on the web; it must never raise and must keep its output contract ---

from hypothesis import given, settings
from hypothesis import strategies as st

_soup = st.text(
    alphabet=st.sampled_from(list(
        "<>/&;=\"' abcdefghijklmnop!-#x123\n\tp")),
    max_size=400)
_tags = st.lists(st.sampled_from(
    ["<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
     "<script>", "</script>", "<nav>", "</nav>", "<!-- c -->",
     "<br/>", "<title>", "</title>", "&amp;", "&#65;", "&bogus;",
     "plain words here ", "<p", "< p>", "<>"]),
    max_size=30).map("".join)


@given(st.one_of(_soup, _tags))
@settings(max_examples=300, deadline=None)
def test_main_content_total_on_arbitrary_input(html):
    r = main_content(html)
    assert isinstance(r["title"], str)
    assert isinstance(r["main_text"], str)
    assert r["n_blocks_kept"] >= 0 and r["n_blocks_dropped"] >= 0
    assert 0.0 <= r["link_density"] <= 1.0
    for block in filter(None, r["main_text"].split("\n\n")):
        # block text is whitespace-normalized
        assert block == " ".join(block.split())
        assert len(block) >= MIN_BLOCK_CHARS
    assert r["n_blocks_kept"] == (
        len([b for b in r["main_text"].split("\n\n") if b])
        if r["main_text"] else 0)


@given(st.one_of(_soup, _tags))
@settings(max_examples=300, deadline=None)
def test_tokenize_reconstructs_all_text(html):
    # tokenizer is total and yields only the three kinds
    for kind, val in tokenize(html):
        assert kind in ("open", "close", "text")
        assert isinstance(val, str)


def test_surrogate_entity_never_reaches_output():
    # &#xD800; is tag-soup-legal but a lone surrogate would crash the
    # Arrow serialization downstream; it must decode to U+FFFD
    html = "<body><p>bad char &#xD800; inside a long enough block of text</p></body>"
    r = main_content(html)
    assert "�" in r["main_text"]
    r["main_text"].encode("utf-8")  # must be valid UTF-8


def test_extract_links_corners():
    from paddleocr_spark.kernels.html import extract_links

    html = ("<nav><a href='/'>H</a> <a href=\"/a&amp;b\">amp</a></nav>"
            "<p><a href=/bare/x>bare</a>"
            "<a HREF='/upper'>case</a>"
            "<a nohref>none</a>"
            "<a href=''>empty</a></p>"
            "<script>var s = '<a href=/fake>never</a>';</script>"
            "<!-- <a href='/ghost'>x</a> -->")
    assert extract_links(html) == ["/", "/a&b", "/bare/x", "/upper", ""]


def test_extract_links_document_order_matches_template():
    # the operator layer's 7-anchor contract on the page template
    from paddleocr_spark.kernels.html import extract_links
    from paddleocr_spark.operators.html_extract import LINK_COEFFS

    n, doc_id = 500, 42
    related = "".join(
        f"<a href='/doc/{(a * doc_id + b) % n}'>doc x</a> "
        for a, b in LINK_COEFFS)
    html = (f"<body><nav><a href='/'>H</a> <a href='/about'>A</a> "
            f"<a href='/contact'>C</a></nav><p>text</p>"
            f"<div>{related}</div>"
            f"<footer><a href='/tos'>T</a></footer></body>")
    links = extract_links(html)
    assert links[:3] == ["/", "/about", "/contact"]
    assert links[3:6] == [f"/doc/{(a * doc_id + b) % n}"
                          for a, b in LINK_COEFFS]
    assert links[6] == "/tos"


@given(st.one_of(_soup, _tags))
@settings(max_examples=300, deadline=None)
def test_extract_links_total(html):
    from paddleocr_spark.kernels.html import extract_links

    links = extract_links(html)
    assert all(isinstance(x, str) for x in links)


def test_href_attribute_name_is_anchored():
    """data-href / xlink:href must not shadow (or fake) the real href."""
    from paddleocr_spark.kernels.html import extract_links

    assert extract_links('<a data-href="/evil" href="/real">x</a>') \
        == ["/real"]
    assert extract_links('<a data-href="/evil">x</a>') == []
    assert extract_links('<a xlink:href="/e" href="/r">x</a>') == ["/r"]
    assert extract_links('<a href="/plain">x</a>') == ["/plain"]


def test_normalization_is_ascii_whitespace_only():
    """NBSP must survive normalization (the DuckDB oracle's RE2 \\s+
    does not collapse it; Python str.split() would)."""
    from paddleocr_spark.kernels.html import main_content

    body = "foo\xa0bar " + "x" * 30
    r = main_content(f"<html><body><p> {body} </p></body></html>")
    assert "foo\xa0bar" in r["main_text"]
    # ASCII edges still stripped, runs still collapsed
    r2 = main_content("<p>a  \t b" + " y" * 20 + "</p>")
    assert r2["main_text"].startswith("a b y")


def test_self_closing_slash_ignored_on_html_elements():
    """HTML5: '<a href=x/>text</a>' keeps the anchor OPEN (its text is
    anchor text -> link-farm density counts it); '<svg/>' (foreign
    content) genuinely self-closes so the drop-subtree state resets."""
    from paddleocr_spark.kernels.html import main_content

    farm = ('<p>' + ''.join(f'<a href="/l{i}"/>link text {i} here</a>'
                            for i in range(6)) + '</p>')
    r = main_content(f"<html><body>{farm}</body></html>")
    assert r["n_blocks_kept"] == 0  # pure link farm must be dropped

    keep = "real content " * 5
    r2 = main_content(f"<html><body><svg/><p>{keep}</p></body></html>")
    assert r2["n_blocks_kept"] == 1  # svg self-close didn't eat the doc
