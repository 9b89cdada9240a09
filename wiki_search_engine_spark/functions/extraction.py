"""HTML -> text extraction, dependency-free (stdlib html.parser).

Faithful reimplementation of the reference's BeautifulSoup extraction
(reference: Crawler/crawler.py:363-390):

1. decompose (remove subtree of) elements matching
   ``.mw-editsection, .navbox, #mw-navigation, #footer, .sidebar, .infobox,
   script, style, .reference, .references`` (crawler.py:363-365);
2. select ``#mw-content-text`` (crawler.py:368);
3. walk its ``p, h1..h6`` elements in document order (crawler.py:373);
   headings render as ``\\n{'#'*level} {text}\\n``, paragraphs as stripped
   text; non-empty parts joined by ``\\n\\n`` (crawler.py:377-387);
4. if ``#mw-content-text`` is absent: ``soup.get_text(" ", strip=True)``
   over the whole cleaned document (crawler.py:390).

The container has no bs4, so this module builds a minimal DOM with
``html.parser.HTMLParser``. The SAME function is the engine pandas-UDF body
and the pytest oracle, so "byte-identical extracted text per url"
(BASELINE.json input_hint) is asserted engine-vs-stored-column in tests.
"""

from __future__ import annotations

from html.parser import HTMLParser

REMOVE_CLASSES = {
    "mw-editsection", "navbox", "sidebar", "infobox", "reference",
    "references",
}
REMOVE_IDS = {"mw-navigation", "footer"}
REMOVE_TAGS = {"script", "style"}
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node or str
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(_Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # close the nearest open ancestor with this tag (lenient, like bs4)
        node = self.cur
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            self.cur = node.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def _parse(html: str) -> _Node:
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


def _should_remove(node: _Node) -> bool:
    if node.tag in REMOVE_TAGS:
        return True
    if node.attrs.get("id") in REMOVE_IDS:
        return True
    classes = set((node.attrs.get("class") or "").split())
    return bool(classes & REMOVE_CLASSES)


def _decompose(node: _Node) -> None:
    kept = []
    for child in node.children:
        if isinstance(child, _Node):
            if _should_remove(child):
                continue
            _decompose(child)
        kept.append(child)
    node.children = kept


def _find_by_id(node: _Node, elem_id: str):
    for child in node.children:
        if isinstance(child, _Node):
            if child.attrs.get("id") == elem_id:
                return child
            found = _find_by_id(child, elem_id)
            if found is not None:
                return found
    return None


def _strings(node: _Node, out: list[str]) -> None:
    for child in node.children:
        if isinstance(child, _Node):
            _strings(child, out)
        else:
            out.append(child)


def _get_text(node: _Node) -> str:
    """bs4 ``element.get_text()`` equivalent: concat descendant strings."""
    parts: list[str] = []
    _strings(node, parts)
    return "".join(parts)


def _get_text_sep_strip(node: _Node) -> str:
    """bs4 ``get_text(' ', strip=True)``: strip each string, drop empties,
    join with a single space."""
    parts: list[str] = []
    _strings(node, parts)
    return " ".join(s for s in (p.strip() for p in parts) if s)


def _content_elements(node: _Node, out: list[_Node]) -> None:
    """All p/h1..h6 descendants in document order (bs4 find_all)."""
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag == "p" or child.tag in HEADINGS:
                out.append(child)
            _content_elements(child, out)


def extract_text(html: str) -> str:
    """Extract article text from HTML per the reference algorithm."""
    root = _parse(html)
    _decompose(root)
    content = _find_by_id(root, "mw-content-text")
    if content is None:
        return _get_text_sep_strip(root)
    elems: list[_Node] = []
    _content_elements(content, elems)
    parts: list[str] = []
    for el in elems:
        if el.tag in HEADINGS:
            level = HEADINGS[el.tag]
            text = _get_text(el).strip()
            if text:
                parts.append("\n" + "#" * level + " " + text + "\n")
        else:
            text = _get_text(el).strip()
            if text:
                parts.append(text)
    return "\n\n".join(parts)


def extract_title(html: str) -> str:
    """<title> text, with the trailing ``- Wikipedia`` suffix kept (the
    reference strips it only for dedup hashing, crawler.py:311)."""
    root = _parse(html)
    node = _find_first_tag(root, "title")
    return _get_text(node).strip() if node is not None else ""


def _find_first_tag(node: _Node, tag: str):
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag == tag:
                return child
            found = _find_first_tag(child, tag)
            if found is not None:
                return found
    return None


def normalize_title(title: str) -> str:
    """First-wins dedup key (reference: Crawler/crawler.py:309-312)."""
    import re

    return re.sub(r"\s*-\s*wikipedia$", "", title, flags=re.I).strip().lower()


IMG_SRC_RE = None  # initialized lazily below

MAX_IMAGES_PER_DOC = 10


def extract_image_srcs(html: str, max_images: int = MAX_IMAGES_PER_DOC):
    """Image srcs from the RAW page in document order, capped.

    The reference crawler downloads page images BEFORE DOM cleanup and
    keeps at most 10 per document (Crawler/crawler.py:326-361), so decoy
    subtrees count too; ids follow insertScript.py:84-92
    (``<file_id>-<i>``) at the caller."""
    global IMG_SRC_RE
    if IMG_SRC_RE is None:
        import re

        IMG_SRC_RE = re.compile(
            r"<img\b[^>]*\bsrc\s*=\s*[\"']([^\"']+)[\"']", re.IGNORECASE
        )
    return IMG_SRC_RE.findall(html or "")[:max_images]


LINK_HREF_RE = None

SKIP_LINK_MARKERS = ("action=edit", "Special:", "File:", "Talk:", "#")


def extract_links(
    html: str,
    base_url: str = "",
    allow_domains: tuple = ("en.wikipedia.org",),
    max_links: int = 200,
):
    """Outgoing page links per the reference crawler's filter chain
    (Crawler/crawler.py:227-269): absolutize against ``base_url``, keep
    http(s) only, drop edit/special/fragment links, restrict to the
    domain allow-list, de-dup preserving order, cap."""
    global LINK_HREF_RE
    if LINK_HREF_RE is None:
        import re

        LINK_HREF_RE = re.compile(
            r"<a\b[^>]*\bhref\s*=\s*[\"']([^\"']+)[\"']", re.IGNORECASE
        )
    from urllib.parse import urljoin, urlparse

    out: list[str] = []
    seen: set[str] = set()
    for href in LINK_HREF_RE.findall(html or ""):
        if any(m in href for m in SKIP_LINK_MARKERS):
            continue
        url = urljoin(base_url, href)
        p = urlparse(url)
        if p.scheme not in ("http", "https"):
            continue
        if allow_domains and p.netloc not in allow_domains:
            continue
        if url in seen:
            continue
        seen.add(url)
        out.append(url)
        if len(out) >= max_links:
            break
    return out


ANCHOR_RE = None


def extract_anchor_texts(
    html: str,
    base_url: str = "",
    allow_domains: tuple = ("en.wikipedia.org",),
    max_links: int = 200,
):
    """(target url, anchor text) pairs — the SAME filter chain as
    extract_links (absolutize, http(s) only, skip-marker drop, domain
    allow-list, cap) but keeping the anchor's visible text (inner tags
    stripped, whitespace collapsed). The same target linked twice
    yields one pair per occurrence (each anchor is an independent
    description of the destination — the signal anchor-text indexing
    aggregates); empty anchors (image links) are dropped."""
    global ANCHOR_RE
    if ANCHOR_RE is None:
        import re

        ANCHOR_RE = re.compile(
            r"<a\b[^>]*\bhref\s*=\s*[\"']([^\"']+)[\"'][^>]*>"
            r"(.*?)</a\s*>",
            re.IGNORECASE | re.DOTALL,
        )
    import re as _re
    from urllib.parse import urljoin, urlparse

    out: list[tuple[str, str]] = []
    for href, inner in ANCHOR_RE.findall(html or ""):
        if any(m in href for m in SKIP_LINK_MARKERS):
            continue
        url = urljoin(base_url, href)
        p = urlparse(url)
        if p.scheme not in ("http", "https"):
            continue
        if allow_domains and p.netloc not in allow_domains:
            continue
        text = _re.sub(r"<[^>]*>", " ", inner)
        text = _re.sub(r"\s+", " ", text).strip()
        if not text:
            continue
        out.append((url, text))
        if len(out) >= max_links:
            break
    return out
