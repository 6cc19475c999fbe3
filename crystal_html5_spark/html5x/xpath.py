"""Minimal XPath 1.0 subset over the html5x DOM.

Parity target: /root/reference/src/html5/xpath/xpath.cr (the reference
delegates evaluation to the external xpath2 shard; we implement the axis /
predicate subset its spec suite exercises: child & descendant axes, `@attr`
attribute axis with synthetic result nodes (xpath.cr:66-82), `..` parent,
`*` wildcard, positional predicates, attribute presence/equality
predicates, and `count()`), plus the first-element dedup quirk of
xpath_nodes (xpath.cr:22-27).
"""

from __future__ import annotations

import re

from .node import DOCUMENT_NODE, ELEMENT_NODE, Node


class XPathError(Exception):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<dslash>//)
  | (?P<slash>/)
  | (?P<dotdot>\.\.)
  | (?P<dot>\.)
  | (?P<at>@)
  | (?P<star>\*)
  | (?P<lbrack>\[)
  | (?P<rbrack>\])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<eq>=)
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<string>'[^']*'|"[^"]*")
  | (?P<name>[A-Za-z_][\w.-]*)
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)


def _tokenize(path: str):
    toks = []
    pos = 0
    while pos < len(path):
        m = _TOKEN_RE.match(path, pos)
        if m is None:
            raise XPathError(f"bad xpath at {path[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    return toks


class _Step:
    __slots__ = ("axis", "test", "predicates")

    def __init__(self, axis: str, test: str, predicates: list):
        self.axis = axis  # child | descendant | attribute | parent | self
        self.test = test  # name or "*"
        self.predicates = predicates


class _AttrRef:
    """Attribute-axis result: owner node + key/val."""

    __slots__ = ("owner", "key", "val")

    def __init__(self, owner: Node, key: str, val: str):
        self.owner = owner
        self.key = key
        self.val = val


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        # count(path) | path
        kind, val = self.peek()
        if kind == "name" and val == "count" and self.i + 1 < len(self.toks) \
                and self.toks[self.i + 1][0] == "lparen":
            self.next()
            self.next()
            path = self.parse_path()
            if self.next()[0] != "rparen":
                raise XPathError("expected )")
            return ("count", path)
        return ("path", self.parse_path())

    def parse_path(self):
        steps = []
        kind, _ = self.peek()
        absolute = False
        if kind in ("slash", "dslash"):
            absolute = True
            if kind == "slash":
                self.next()
                steps.append(self.parse_step("child"))
            else:
                self.next()
                steps.append(self.parse_step("descendant"))
        else:
            steps.append(self.parse_step("child"))
        while True:
            kind, _ = self.peek()
            if kind == "slash":
                self.next()
                steps.append(self.parse_step("child"))
            elif kind == "dslash":
                self.next()
                steps.append(self.parse_step("descendant"))
            else:
                break
        return (absolute, steps)

    def parse_step(self, axis: str) -> _Step:
        kind, val = self.next()
        if kind == "dotdot":
            return _Step("parent", "*", [])
        if kind == "dot":
            return _Step("self", "*", [])
        if kind == "at":
            kind, val = self.next()
            if kind != "name":
                raise XPathError("expected attribute name after @")
            return _Step(
                "attribute" if axis == "child" else "descendant-attribute",
                val, self.parse_predicates(),
            )
        if kind == "star":
            return _Step(axis, "*", self.parse_predicates())
        if kind == "name":
            return _Step(axis, val, self.parse_predicates())
        raise XPathError(f"unexpected token {val!r}")

    def parse_predicates(self):
        preds = []
        while self.peek()[0] == "lbrack":
            self.next()
            kind, val = self.peek()
            if kind == "number":
                self.next()
                preds.append(("pos", int(float(val))))
            elif kind == "at":
                self.next()
                kind, name = self.next()
                if kind != "name":
                    raise XPathError("expected attribute name after @")
                if self.peek()[0] == "eq":
                    self.next()
                    kind, sval = self.next()
                    if kind != "string":
                        raise XPathError("expected string literal")
                    preds.append(("attr-eq", name, sval[1:-1]))
                else:
                    preds.append(("attr", name))
            elif kind in ("name", "slash", "dslash", "dot", "dotdot"):
                preds.append(("path", self.parse_path()))
            else:
                raise XPathError(f"unsupported predicate {val!r}")
            if self.next()[0] != "rbrack":
                raise XPathError("expected ]")
        return preds


def _descendants(n: Node):
    stack = []
    c = n.first_child
    while c is not None:
        stack.append(c)
        c = c.next_sibling
    out = []
    i = 0
    # BFS would break document order; do an explicit DFS.
    stack2 = list(reversed(stack))
    while stack2:
        cur = stack2.pop()
        out.append(cur)
        kids = []
        c = cur.first_child
        while c is not None:
            kids.append(c)
            c = c.next_sibling
        stack2.extend(reversed(kids))
    return out


def _name_matches(n: Node, test: str) -> bool:
    if n.type != ELEMENT_NODE:
        return False
    return test == "*" or n.data == test


def _get_attr(n, key: str):
    if isinstance(n, _AttrRef):
        return None
    for a in n.attr:
        if a.key == key:
            return a
    return None


def _apply_predicates(candidates, preds, eval_path):
    for p in preds:
        if p[0] == "pos":
            idx = p[1]
            candidates = [candidates[idx - 1]] if 0 < idx <= len(candidates) \
                else []
        elif p[0] == "attr":
            candidates = [c for c in candidates
                          if _get_attr(c, p[1]) is not None]
        elif p[0] == "attr-eq":
            out = []
            for c in candidates:
                a = _get_attr(c, p[1])
                if a is not None and a.val == p[2]:
                    out.append(c)
            candidates = out
        elif p[0] == "path":
            candidates = [c for c in candidates
                          if isinstance(c, Node) and eval_path(p[1], [c])]
    return candidates


def _eval_path(path, context):
    """Evaluate (absolute, steps) against a context node list."""
    absolute, steps = path
    result = list(context)
    for step in steps:
        nxt = []
        seen = set()

        def add(x):
            key = id(x.owner) if isinstance(x, _AttrRef) else id(x)
            key = (key, x.key) if isinstance(x, _AttrRef) else key
            if key not in seen:
                seen.add(key)
                nxt.append(x)

        for ctx in result:
            if step.axis == "parent":
                if isinstance(ctx, _AttrRef):
                    add(ctx.owner)
                elif ctx.parent is not None:
                    add(ctx.parent)
                continue
            if step.axis == "self":
                add(ctx)
                continue
            if isinstance(ctx, _AttrRef):
                continue
            if step.axis == "attribute":
                a = _get_attr(ctx, step.test)
                if a is not None:
                    add(_AttrRef(ctx, a.key, a.val))
                continue
            if step.axis == "descendant-attribute":
                for d in _descendants(ctx):
                    a = _get_attr(d, step.test)
                    if a is not None:
                        add(_AttrRef(d, a.key, a.val))
                continue
            if step.axis == "child":
                cands = [c for c in _children(ctx)
                         if _name_matches(c, step.test)]
            else:  # descendant
                cands = [d for d in _descendants(ctx)
                         if _name_matches(d, step.test)]
            for c in _apply_predicates(cands, step.predicates, _eval_path):
                add(c)
        result = nxt
    return result


def _children(n: Node):
    out = []
    c = n.first_child
    while c is not None:
        out.append(c)
        c = c.next_sibling
    return out


def _materialize(x):
    """Attribute results become synthetic Element+Text (xpath.cr:66-82)."""
    if isinstance(x, _AttrRef):
        child = Node(type=1, data=x.val)  # TEXT_NODE
        ret = Node(type=ELEMENT_NODE, data=x.key)
        ret.first_child = child
        ret.last_child = child
        return ret
    return x


def _eval(node: Node, path: str):
    expr = _Parser(_tokenize(path)).parse()
    if expr[0] == "count":
        return float(len(_eval_path(expr[1], [node])))
    return _eval_path(expr[1], [node])


def xpath(node: Node, path: str):
    """First match or None — xpath.cr:7-13."""
    res = _eval(node, path)
    if isinstance(res, float):
        return None
    return _materialize(res[0]) if res else None


def xpath_nodes(node: Node, path: str) -> list[Node]:
    """All matches with the reference's first-element dedup quirk
    (xpath.cr:15-31)."""
    res = _eval(node, path)
    if isinstance(res, float):
        return []
    elems: list[Node] = []
    for x in res:
        n = _materialize(x)
        if elems and (
            elems[0] is n
            or (
                isinstance(x, _AttrRef)
                and x.key == elems[0].data
                and x.val == elems[0].inner_text()
            )
        ):
            continue
        elems.append(n)
    return elems


def xpath_float(node: Node, path: str) -> float:
    res = _eval(node, path)
    if not isinstance(res, float):
        raise XPathError("expression does not evaluate to a number")
    return res


def xpath_bool(node: Node, path: str) -> bool:
    res = _eval(node, path)
    if isinstance(res, float):
        return res != 0.0
    return bool(res)


def xpath_evaluate(node: Node, path: str):
    """Evaluate and return the appropriately-typed result (float for
    count(), materialized node list for paths) — xpath.cr:49-53."""
    res = _eval(node, path)
    if isinstance(res, float):
        return res
    return [_materialize(x) for x in res]


def attribute_value(node: Node, name: str) -> str:
    """xpath.cr:58-64."""
    if node.type == ELEMENT_NODE and node.parent is None and name == node.data:
        return node.inner_text()
    for a in node.attr:
        if a.key == name:
            return a.val
    return ""
