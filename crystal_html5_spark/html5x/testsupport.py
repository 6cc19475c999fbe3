"""Test support: html5lib-format tree dump, .dat fixture reader, and tree
consistency checks.

Parity targets: /root/reference/spec/spec_helper.cr:125-185 (read_parse_test),
:187-271 (dump), :15-122 (consistency checks).  Used by pytest and by the
pages-table synthesizer; not part of the production extract path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .node import (
    COMMENT_NODE,
    DOCTYPE_NODE,
    DOCUMENT_NODE,
    ELEMENT_NODE,
    ERROR_NODE,
    SCOPE_MARKER_NODE,
    TEXT_NODE,
    Node,
)


@dataclass
class TreeTestCase:
    text: str = ""
    want: str = ""
    context: str = ""
    scripting: bool = True
    fname: str = ""
    index: int = 0


def _dump_indent(out: list[str], level: int) -> None:
    out.append("| ")
    out.append("  " * level)


def _dump_level(out: list[str], n: Node, level: int) -> None:
    _dump_indent(out, level)
    level += 1
    t = n.type
    if t == ERROR_NODE:
        raise AssertionError("unexpected Error Node")
    if t == DOCUMENT_NODE:
        raise AssertionError("unexpected Document Node")
    if t == ELEMENT_NODE:
        if n.namespace:
            out.append(f"<{n.namespace} {n.data}>")
        else:
            out.append(f"<{n.data}>")
        for a in sorted(n.attr, key=lambda a: (a.namespace, a.key)):
            out.append("\n")
            _dump_indent(out, level)
            if not a.namespace:
                out.append(f'{a.key}="{a.val}"')
            else:
                out.append(f'{a.namespace} {a.key}="{a.val}"')
        if not n.namespace and n.data_atom == "template":
            out.append("\n")
            _dump_indent(out, level)
            level += 1
            out.append("content")
    elif t == TEXT_NODE:
        out.append(f'"{n.data}"')
    elif t == COMMENT_NODE:
        out.append(f"<!-- {n.data} -->")
    elif t == DOCTYPE_NODE:
        out.append(f"<!DOCTYPE {n.data}")
        if n.attr:
            pub, sys = "", ""
            for a in n.attr:
                if a.key == "public":
                    pub = a.val
                elif a.key == "system":
                    sys = a.val
            if pub or sys:
                out.append(f' "{pub}"')
                out.append(f' "{sys}"')
        out.append(">")
    elif t == SCOPE_MARKER_NODE:
        raise AssertionError("unexpected ScopeMarker Node")
    else:
        raise AssertionError("unknown node type")
    out.append("\n")
    c = n.first_child
    while c is not None:
        _dump_level(out, c, level)
        c = c.next_sibling


def dump(n: Node | None) -> str:
    if n is None or n.first_child is None:
        return ""
    out: list[str] = []
    c = n.first_child
    while c is not None:
        _dump_level(out, c, 0)
        c = c.next_sibling
    return "".join(out)


def read_dat_file(path: str) -> list[TreeTestCase]:
    """Parse an html5lib/WebKit .dat fixture file into test cases."""
    # Split on "\n" only, no newline translation (fixtures contain literal
    # \r bytes — the reference reader uses gets('\n')).
    with open(path, encoding="utf-8", newline="\n") as f:
        raw_lines = f.readlines()
    cases: list[TreeTestCase] = []
    i = 0
    n = len(raw_lines)
    idx = 0
    while i < n:
        line = raw_lines[i]
        if line != "#data\n" and line.strip() != "#data":
            i += 1
            continue
        i += 1
        ta = TreeTestCase(fname=path, index=idx)
        idx += 1
        # Read the HTML until a '#' line.
        html_lines = []
        while i < n:
            s = raw_lines[i].rstrip("\n")
            if s.startswith("#"):
                break
            html_lines.append(s)
            i += 1
        ta.text = "\n".join(html_lines)
        # Skip the error list.
        assert raw_lines[i].rstrip("\n") == "#errors", raw_lines[i]
        i += 1
        while i < n and not raw_lines[i].startswith("#"):
            i += 1
        line = raw_lines[i].rstrip("\n") if i < n else ""
        if line.startswith("#script-"):
            ta.scripting = line.endswith("-on")
            i += 1
            while i < n and not raw_lines[i].startswith("#"):
                i += 1
            line = raw_lines[i].rstrip("\n") if i < n else ""
        if line.strip() == "#document-fragment":
            i += 1
            ta.context = raw_lines[i].strip()
            i += 1
            line = raw_lines[i].rstrip("\n") if i < n else ""
        assert line.strip() == "#document", f"{path}: got {line!r}"
        i += 1
        # Read the expected dump; quote tracking per spec_helper.cr:166-183.
        want: list[str] = []
        in_quote = False
        while i < n:
            line = raw_lines[i]
            trimmed = line.strip("\n |")
            if trimmed:
                if line[0] == "|" and trimmed[0] == '"':
                    in_quote = True
                if trimmed[-1] == '"' and not (
                    line[0] == "|" and len(trimmed) == 1
                ):
                    in_quote = False
            if line == "" or (line == "\n" and not in_quote):
                break
            want.append(line)
            i += 1
        ta.want = "".join(want)
        cases.append(ta)
    return cases


def check_tree_consistency(n: Node, depth: int = 0) -> None:
    """Port of spec_helper.cr:15-118."""
    assert depth != 10000, "tree looks like it contains a cycle"
    _check_node_consistency(n)
    c = n.first_child
    while c is not None:
        check_tree_consistency(c, depth + 1)
        c = c.next_sibling


def _check_node_consistency(n: Node) -> None:
    nparent = 0
    p = n.parent
    while p is not None:
        nparent += 1
        assert nparent != 10000, "parent list looks like an infinite loop"
        p = p.parent
    nforward = 0
    c = n.first_child
    while c is not None:
        nforward += 1
        assert nforward != 1000000
        assert c.parent is n, "inconsistent child/parent relationship"
        c = c.next_sibling
    nbackward = 0
    c = n.last_child
    while c is not None:
        nbackward += 1
        assert nbackward != 1000000
        assert c.parent is n, "inconsistent child/parent relationship"
        c = c.prev_sibling
    parent = n.parent
    if parent is not None:
        assert parent is not n
        assert parent is not n.first_child
        assert parent is not n.last_child
        assert parent is not n.prev_sibling
        assert parent is not n.next_sibling
        found = False
        c = parent.first_child
        while c is not None:
            if c is n:
                found = True
                break
            c = c.next_sibling
        assert found, "inconsistent parent/child relationship"
    if n.prev_sibling is not None:
        assert n.prev_sibling.next_sibling is n
    if n.next_sibling is not None:
        assert n.next_sibling.prev_sibling is n
    assert (n.first_child is None) == (n.last_child is None)
    if n.first_child is not None and n.first_child is n.last_child:
        assert n.first_child.prev_sibling is None
        assert n.first_child.next_sibling is None


def run_tree_case(ta: TreeTestCase):
    """Parse one .dat case and return (doc, got_dump) — spec_helper.cr:277-307."""
    from .atoms import lookup as atom_lookup
    from .parser import parse, parse_fragment

    if not ta.context:
        doc = parse(ta.text.encode("utf-8"), scripting=ta.scripting)
    else:
        ctx = ta.context
        namespace = ""
        i = ctx.find(" ")
        if i >= 0:
            namespace, ctx = ctx[:i], ctx[i + 1:]
        cnode = Node(
            type=ELEMENT_NODE,
            data_atom=atom_lookup(ctx),
            data=ctx,
            namespace=namespace,
        )
        nodes = parse_fragment(ta.text.encode("utf-8"), cnode,
                               scripting=ta.scripting)
        doc = Node(type=DOCUMENT_NODE)
        for nd in nodes:
            doc.append_child(nd)
    check_tree_consistency(doc)
    return doc, dump(doc)
