"""Known tag/attribute name set (the reference's interned Atom table).

Parity target: /root/reference/src/html5/atom/table.cr (376 names from the
HTML Living Standard index, incl. legacy names kept for compatibility and
the camelCase SVG ``foreignObject``).  The reference interns these as u32
handles for integer comparison in hot loops; in Python, interned ``str``
objects give the same pointer-compare fast path, so the "atom" of a name is
simply the name itself when known, else ``""`` (the zero atom).
"""

ATOMS = frozenset((
    "a", "abbr", "accept", "accept-charset", "accesskey", "acronym",
    "action", "address", "align", "allowfullscreen", "allowpaymentrequest", "allowusermedia",
    "alt", "annotation", "annotation-xml", "applet", "area", "article",
    "as", "aside", "async", "audio", "autocapitalize", "autocomplete",
    "autofocus", "autoplay", "b", "base", "basefont", "bdi",
    "bdo", "bgsound", "big", "blink", "blockquote", "body",
    "br", "button", "canvas", "caption", "center", "challenge",
    "charset", "checked", "cite", "class", "code", "col",
    "colgroup", "color", "cols", "colspan", "command", "content",
    "contenteditable", "contextmenu", "controls", "coords", "crossorigin", "data",
    "datalist", "datetime", "dd", "decoding", "default", "defer",
    "del", "desc", "details", "dfn", "dialog", "dir",
    "dirname", "disabled", "div", "dl", "download", "draggable",
    "dropzone", "dt", "em", "embed", "enctype", "enterkeyhint",
    "face", "fieldset", "figcaption", "figure", "font", "footer",
    "for", "foreignObject", "foreignobject", "form", "formaction", "formenctype",
    "formmethod", "formnovalidate", "formtarget", "frame", "frameset", "h1",
    "h2", "h3", "h4", "h5", "h6", "head",
    "header", "headers", "height", "hgroup", "hidden", "high",
    "hr", "href", "hreflang", "html", "http-equiv", "i",
    "icon", "id", "iframe", "image", "imagesizes", "imagesrcset",
    "img", "input", "inputmode", "ins", "integrity", "is",
    "isindex", "ismap", "itemid", "itemprop", "itemref", "itemscope",
    "itemtype", "kbd", "keygen", "keytype", "kind", "label",
    "lang", "legend", "li", "link", "list", "listing",
    "loading", "loop", "low", "main", "malignmark", "manifest",
    "map", "mark", "marquee", "math", "max", "maxlength",
    "media", "mediagroup", "menu", "menuitem", "meta", "meter",
    "method", "mglyph", "mi", "min", "minlength", "mn",
    "mo", "ms", "mtext", "multiple", "muted", "name",
    "nav", "nobr", "noembed", "noframes", "nomodule", "nonce",
    "noscript", "novalidate", "object", "ol", "onabort", "onafterprint",
    "onautocomplete", "onautocompleteerror", "onauxclick", "onbeforeprint", "onbeforeunload", "onblur",
    "oncancel", "oncanplay", "oncanplaythrough", "onchange", "onclick", "onclose",
    "oncontextmenu", "oncopy", "oncuechange", "oncut", "ondblclick", "ondrag",
    "ondragend", "ondragenter", "ondragexit", "ondragleave", "ondragover", "ondragstart",
    "ondrop", "ondurationchange", "onemptied", "onended", "onerror", "onfocus",
    "onformdata", "onhashchange", "oninput", "oninvalid", "onkeydown", "onkeypress",
    "onkeyup", "onlanguagechange", "onload", "onloadeddata", "onloadedmetadata", "onloadend",
    "onloadstart", "onmessage", "onmessageerror", "onmousedown", "onmouseenter", "onmouseleave",
    "onmousemove", "onmouseout", "onmouseover", "onmouseup", "onmousewheel", "onoffline",
    "ononline", "onpagehide", "onpageshow", "onpaste", "onpause", "onplay",
    "onplaying", "onpopstate", "onprogress", "onratechange", "onrejectionhandled", "onreset",
    "onresize", "onscroll", "onsecuritypolicyviolation", "onseeked", "onseeking", "onselect",
    "onshow", "onslotchange", "onsort", "onstalled", "onstorage", "onsubmit",
    "onsuspend", "ontimeupdate", "ontoggle", "onunhandledrejection", "onunload", "onvolumechange",
    "onwaiting", "onwheel", "open", "optgroup", "optimum", "option",
    "output", "p", "param", "pattern", "picture", "ping",
    "placeholder", "plaintext", "playsinline", "poster", "pre", "preload",
    "progress", "prompt", "public", "q", "radiogroup", "rb",
    "readonly", "referrerpolicy", "rel", "required", "reversed", "rows",
    "rowspan", "rp", "rt", "rtc", "ruby", "s",
    "samp", "sandbox", "scope", "scoped", "script", "seamless",
    "section", "select", "selected", "shape", "size", "sizes",
    "slot", "small", "sortable", "sorted", "source", "spacer",
    "span", "spellcheck", "src", "srcdoc", "srclang", "srcset",
    "start", "step", "strike", "strong", "style", "sub",
    "summary", "sup", "svg", "system", "tabindex", "table",
    "target", "tbody", "td", "template", "textarea", "tfoot",
    "th", "thead", "time", "title", "tr", "track",
    "translate", "tt", "type", "typemustmatch", "u", "ul",
    "updateviacache", "usemap", "value", "var", "video", "wbr",
    "width", "workertype", "wrap", "xmp",
))


def lookup(name: str) -> str:
    """Return the atom for ``name`` ("" when unknown) — atom/atom.cr:62-70."""
    return name if name in ATOMS else ""
