"""Recursive-descent Cypher parser.

Grammar follows the reference ANTLR grammar
(reference: ``community/cypher/front-end/antlr-parser/.../CypherParser.g4``,
1,864 lines) restricted to the read+write analytics surface in SURVEY §2.
Precedence ladder (low to high): OR, XOR, AND, NOT, comparison chains,
predicate ops (IN / STARTS WITH / ENDS WITH / CONTAINS / =~ / IS NULL),
additive, multiplicative, power, unary minus, postfix (property / index /
slice / label-check), atom.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from . import ast as A
from .lexer import Token, tokenize


class ParseError(ValueError):
    pass


CLAUSE_STARTS = {
    "MATCH", "OPTIONAL", "UNWIND", "WITH", "RETURN", "CALL", "CREATE",
    "MERGE", "SET", "REMOVE", "DELETE", "DETACH", "UNION", "LOAD", "FOREACH",
    "INSERT", "FINISH", "USE",
}

DOTTED_FN_NS = {
    "vector", "duration", "point", "db", "dbms", "datetime", "date", "time",
    "localtime", "localdatetime", "apoc", "text", "graph",
}


class Parser:
    def __init__(self, text: str) -> None:
        self.text = text
        self.toks = tokenize(text)
        self.i = 0

    # ---- token helpers ---------------------------------------------------

    def peek(self, ahead: int = 0) -> Token:
        j = min(self.i + ahead, len(self.toks) - 1)
        return self.toks[j]

    def at_kw(self, *kws: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t.kind == "IDENT" and t.upper() in kws

    def at_op(self, *ops: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t.kind == "OP" and t.value in ops

    def take(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def expect_kw(self, kw: str) -> Token:
        if not self.at_kw(kw):
            raise ParseError(f"expected {kw}, got {self.peek().value!r} at {self.peek().pos}")
        return self.take()

    def expect_op(self, op: str) -> Token:
        if not self.at_op(op):
            raise ParseError(f"expected {op!r}, got {self.peek().value!r} at {self.peek().pos}")
        return self.take()

    def expect_ident(self) -> str:
        t = self.peek()
        if t.kind != "IDENT":
            raise ParseError(f"expected identifier, got {t.value!r} at {t.pos}")
        self.take()
        return t.value

    def src(self, start_tok: Token, end_pos: int) -> str:
        return self.text[start_tok.pos : end_pos].strip()

    # ---- query roots -----------------------------------------------------

    def parse_query(self):
        first = self.parse_single_query()
        if not self.at_kw("UNION"):
            if self.peek().kind != "EOF":
                raise ParseError(f"unexpected trailing input at {self.peek().pos}: {self.peek().value!r}")
            return first
        queries = [first]
        is_all: Optional[bool] = None
        while self.at_kw("UNION"):
            self.take()
            this_all = False
            if self.at_kw("ALL"):
                self.take()
                this_all = True
            elif self.at_kw("DISTINCT"):
                self.take()
            if is_all is None:
                is_all = this_all
            elif is_all != this_all:
                raise ParseError("cannot mix UNION and UNION ALL")
            queries.append(self.parse_single_query())
        if self.peek().kind != "EOF":
            raise ParseError(f"unexpected trailing input at {self.peek().pos}")
        return A.UnionQuery(queries, all=bool(is_all))

    def _parse_union_body(self):
        """Full subquery-expression body: a single query, or a UNION
        [ALL|DISTINCT] chain of them (EXISTS/COUNT/COLLECT {...} all
        accept the same body grammar)."""
        first = self.parse_single_query()
        if not self.at_kw("UNION"):
            return first
        queries = [first]
        is_all: Optional[bool] = None
        while self.at_kw("UNION"):
            self.take()
            this_all = False
            if self.at_kw("ALL"):
                self.take()
                this_all = True
            elif self.at_kw("DISTINCT"):
                self.take()
            if is_all is None:
                is_all = this_all
            elif is_all != this_all:
                raise ParseError("cannot mix UNION and UNION ALL")
            queries.append(self.parse_single_query())
        return A.UnionQuery(queries, all=bool(is_all))

    def parse_single_query(self) -> A.SingleQuery:
        clauses: List[A.Clause] = []
        while True:
            t = self.peek()
            if t.kind == "EOF" or self.at_kw("UNION") or self.at_op("}"):
                break
            clauses.append(self.parse_clause())
        if not clauses:
            raise ParseError("empty query")
        return A.SingleQuery(clauses)

    # ---- clauses ---------------------------------------------------------

    def parse_clause(self) -> A.Clause:
        if self.at_kw("OPTIONAL"):
            self.take()
            if self.at_kw("CALL"):  # OPTIONAL CALL {} (Clause.scala)
                self.take()
                c = self.parse_call()
                import dataclasses
                if isinstance(c, A.CallSub):
                    c = dataclasses.replace(c, optional=True)
                return c
            self.expect_kw("MATCH")
            return self.parse_match(optional=True)
        if self.at_kw("MATCH"):
            self.take()
            return self.parse_match(optional=False)
        if self.at_kw("UNWIND"):
            self.take()
            e = self.parse_expr()
            self.expect_kw("AS")
            return A.Unwind(e, self.expect_ident())
        if self.at_kw("WITH"):
            self.take()
            return self.parse_projection(is_return=False)
        if self.at_kw("RETURN"):
            self.take()
            return self.parse_projection(is_return=True)
        if self.at_kw("CALL"):
            self.take()
            return self.parse_call()
        if self.at_kw("LOAD"):
            self.take()
            self.expect_kw("CSV")
            with_headers = False
            if self.at_kw("WITH"):
                self.take()
                self.expect_kw("HEADERS")
                with_headers = True
            self.expect_kw("FROM")
            url = self.parse_expr()
            self.expect_kw("AS")
            var = self.expect_ident()
            term = None
            if self.at_kw("FIELDTERMINATOR"):
                self.take()
                t = self.take()
                term = str(t.value)
            return A.LoadCSV(url, var, with_headers, term)
        if self.at_kw("CREATE"):
            self.take()
            return A.Create(self.parse_pattern())
        if self.at_kw("INSERT"):
            # GQL INSERT — CREATE synonym (Clause.scala Insert); the node
            # grammar (&-conjoined labels) is already shared
            self.take()
            return A.Create(self.parse_pattern())
        if self.at_kw("FINISH"):
            self.take()
            return A.Finish()
        if self.at_kw("USE"):
            self.take()
            # optional GRAPH keyword — but "graph" may instead be the
            # namespace of graph.byName()/graph.byElementId()
            if self.at_kw("GRAPH") and not self.at_op(".", ahead=1):
                self.take()
            parts = [self.expect_ident()]
            while self.at_op("."):
                self.take()
                parts.append(self.expect_ident())
            # dynamic graph references: USE graph.byName(expr) /
            # graph.byElementId(expr) (GraphByName.scala)
            if (len(parts) == 2 and parts[0].lower() == "graph"
                    and parts[1].lower() in ("byname", "byelementid")
                    and self.at_op("(")):
                self.take()
                arg = self.parse_expr()
                self.expect_op(")")
                return A.Use("", via=parts[1].lower(), dynamic=arg)
            return A.Use(".".join(parts))
        if self.at_kw("MERGE"):
            self.take()
            part = self.parse_pattern_part()
            on_create: List[A.SetItem] = []
            on_match: List[A.SetItem] = []
            while self.at_kw("ON"):
                self.take()
                which = self.expect_ident().upper()
                self.expect_kw("SET")
                items = self.parse_set_items()
                if which == "CREATE":
                    on_create.extend(items)
                else:
                    on_match.extend(items)
            return A.Merge(part, on_create, on_match)
        if self.at_kw("SET"):
            self.take()
            return A.SetClause(self.parse_set_items())
        if self.at_kw("REMOVE"):
            self.take()
            items = []
            while True:
                e = self.parse_postfix_target()
                items.append(A.SetItem(e, None, "remove"))
                if self.at_op(","):
                    self.take()
                    continue
                break
            return A.RemoveClause(items)
        if self.at_kw("FOREACH"):
            self.take()
            self.expect_op("(")
            var = self.expect_ident()
            self.expect_kw("IN")
            source = self.parse_expr()
            self.expect_op("|")
            updates: List[A.Clause] = []
            while not self.at_op(")"):
                updates.append(self.parse_clause())
            self.expect_op(")")
            return A.Foreach(var, source, updates)
        if self.at_kw("DETACH"):
            self.take()
            self.expect_kw("DELETE")
            return A.Delete(self.parse_expr_list(), detach=True)
        if self.at_kw("NODETACH"):
            # explicit plain-delete keyword (Cypher 5 NODETACH DELETE):
            # same constraint check as bare DELETE — a still-connected
            # node raises
            self.take()
            self.expect_kw("DELETE")
            return A.Delete(self.parse_expr_list(), detach=False)
        if self.at_kw("DELETE"):
            self.take()
            return A.Delete(self.parse_expr_list(), detach=False)
        raise ParseError(f"unexpected token {self.peek().value!r} at {self.peek().pos}")

    def parse_expr_list(self) -> List[A.Expr]:
        out = [self.parse_expr()]
        while self.at_op(","):
            self.take()
            out.append(self.parse_expr())
        return out

    def parse_set_items(self) -> List[A.SetItem]:
        items: List[A.SetItem] = []
        while True:
            target = self.parse_postfix_target()
            if self.at_op("="):
                self.take()
                items.append(A.SetItem(target, self.parse_expr(), "replace_map"
                                       if isinstance(target, A.Var) else "set"))
            elif self.at_op("+="):
                self.take()
                items.append(A.SetItem(target, self.parse_expr(), "merge_map"))
            elif isinstance(target, A.HasLabels):
                items.append(A.SetItem(target, None, "add_labels"))
            else:
                raise ParseError(f"bad SET item at {self.peek().pos}")
            if self.at_op(","):
                self.take()
                continue
            break
        return items

    def parse_postfix_target(self) -> A.Expr:
        """Target of SET/REMOVE: var, var.prop, var:Label."""
        name = self.expect_ident()
        e: A.Expr = A.Var(name)
        if self.at_op("."):
            self.take()
            e = A.Prop(e, self.expect_ident())
            return e
        if self.at_op(":") or self.at_kw("IS"):
            labels = []
            first = True
            used_is = False
            while self.at_op(":") or (first and self.at_kw("IS")):
                # GQL `SET n IS Label` / `REMOVE n IS Label` — the IS
                # introducer reads exactly like a leading ':'
                used_is = used_is or self.at_kw("IS")
                first = False
                self.take()
                if self.at_op("$"):
                    # SET/REMOVE n:$(expr) dynamic label
                    self.take()
                    self.expect_op("(")
                    ex = self.parse_expr()
                    self.expect_op(")")
                    labels.append(ex)
                else:
                    labels.append(self.expect_ident())
            return A.HasLabels(e, labels, lx_gpm=used_is,
                               lx_legacy=len(labels) > 1)
        return e

    def parse_match(self, optional: bool) -> A.Match:
        parts = self.parse_pattern()
        # planner hints (USING INDEX/SCAN/JOIN …, Hint.scala): parsed and
        # dropped — Catalyst/AQE own physical planning (SURVEY §4.2), so a
        # hinted query must still run, hint-free
        while self.at_kw("USING"):
            self.take()
            while (self.peek().kind != "EOF"
                   and not self.at_kw("WHERE", "USING", *CLAUSE_STARTS)
                   and not self.at_op("}")):
                self.take()
        where = None
        if self.at_kw("WHERE"):
            self.take()
            where = self.parse_expr()
        return A.Match(parts, optional=optional, where=where)

    def parse_call(self) -> A.Clause:
        # GQL variable-scope clause (Neo4j 5.23+ Clause.scala
        # SubqueryCall.InTransactionsParameters / scope syntax):
        # CALL (a, b) { ... } imports exactly a, b; CALL (*) imports the
        # whole scope; CALL () imports nothing.
        scope_imports: Optional[List[str]] = None
        if self.at_op("("):
            self.take()
            scope_imports = []
            if self.at_op("*"):
                self.take()
                scope_imports = ["*"]
            elif not self.at_op(")"):
                while True:
                    scope_imports.append(self.expect_ident())
                    if self.at_op(","):
                        self.take()
                        continue
                    break
            self.expect_op(")")
            if not self.at_op("{"):
                raise ParseError("expected { after CALL scope clause")
        if self.at_op("{"):
            self.take()

            def branch_imports() -> List[str]:
                """A leading `WITH a, b` of bare variables (import header);
                each UNION branch carries its own."""
                imps: List[str] = []
                if not self.at_kw("WITH"):
                    return imps
                save = self.i
                self.take()
                ok = True
                while True:
                    if self.peek().kind != "IDENT":
                        ok = False
                        break
                    imps.append(self.expect_ident())
                    if self.at_op(","):
                        self.take()
                        continue
                    break
                # a true import header is followed by another clause keyword
                if not ok or self.at_kw("AS") or self.at_op(".", "+", "-"):
                    self.i = save
                    return []
                return imps

            imports = branch_imports()
            sub = self.parse_single_query()
            if self.at_kw("UNION"):
                branches = [sub]
                is_all: Optional[bool] = None
                while self.at_kw("UNION"):
                    self.take()
                    this_all = False
                    if self.at_kw("ALL"):
                        self.take()
                        this_all = True
                    elif self.at_kw("DISTINCT"):
                        self.take()
                    if is_all is None:
                        is_all = this_all
                    elif is_all != this_all:
                        raise ParseError("cannot mix UNION and UNION ALL")
                    for v in branch_imports():
                        if v not in imports:
                            imports.append(v)
                    branches.append(self.parse_single_query())
                sub = A.UnionQuery(branches, all=bool(is_all))
            self.expect_op("}")
            call = A.CallSub(sub, scope_imports if scope_imports is not None
                             else imports)
            if self.at_kw("IN"):
                self.take()
                call.in_transactions = True
                # grammar: IN (expression? CONCURRENT)? TRANSACTIONS
                # (CypherParser.g4:203).  Bare CONCURRENT = runtime-chosen
                # concurrency (recorded as 0); with an expression, the
                # constant is evaluated at translate time like batch_rows.
                if self.at_kw("CONCURRENT"):
                    self.take()
                    call.concurrency = 0
                elif not self.at_kw("TRANSACTIONS"):
                    call.concurrency = self.parse_expr()
                    self.expect_kw("CONCURRENT")
                self.expect_kw("TRANSACTIONS")
                if self.at_kw("OF"):
                    self.take()
                    # any constant expression (literal, $param, reduce of
                    # literals, …); graph-touching expressions are
                    # rejected at translate time (NonConstantExpression,
                    # CypherTransactionsAcceptance)
                    call.batch_rows = self.parse_expr()
                    if self.at_kw("ROWS", "ROW"):
                        self.take()
                if self.at_kw("ON"):
                    self.take()
                    self.expect_kw("ERROR")
                    call.on_error = self.take().upper()  # CONTINUE|BREAK|FAIL
                if self.at_kw("REPORT"):
                    self.take()
                    self.expect_kw("STATUS")
                    self.expect_kw("AS")
                    call.report_var = self.expect_ident()
            return call
        name_parts = [self.expect_ident()]
        while self.at_op("."):
            self.take()
            name_parts.append(self.expect_ident())
        name = ".".join(name_parts)
        args: List[A.Expr] = []
        if self.at_op("("):
            self.take()
            if not self.at_op(")"):
                args = self.parse_expr_list()
            self.expect_op(")")
        yields: List[Tuple[str, Optional[str]]] = []
        where = None
        if self.at_kw("YIELD"):
            self.take()
            if self.at_op("*"):  # YIELD * — all declared output columns
                self.take()
                if self.at_kw("WHERE"):
                    self.take()
                    where = self.parse_expr()
                return A.CallProc(name, args, [("*", None)], where)
            while True:
                col = self.expect_ident()
                alias = None
                if self.at_kw("AS"):
                    self.take()
                    alias = self.expect_ident()
                yields.append((col, alias))
                if self.at_op(","):
                    self.take()
                    continue
                break
            if self.at_kw("WHERE"):
                self.take()
                where = self.parse_expr()
        return A.CallProc(name, args, yields, where)

    def parse_projection(self, is_return: bool) -> A.Projection:
        distinct = False
        if self.at_kw("DISTINCT"):
            self.take()
            distinct = True
        star = False
        items: List[A.ReturnItem] = []
        if self.at_op("*"):
            self.take()
            star = True
            if self.at_op(","):  # WITH *, extra AS x (Clause.scala With)
                self.take()
                items = self.parse_return_items()
        else:
            items = self.parse_return_items()
        order: List[A.OrderItem] = []
        skip = limit = where = None
        if self.at_kw("ORDER"):
            self.take()
            self.expect_kw("BY")
            while True:
                e = self.parse_expr()
                asc = True
                if self.at_kw("ASC", "ASCENDING"):
                    self.take()
                elif self.at_kw("DESC", "DESCENDING"):
                    self.take()
                    asc = False
                order.append(A.OrderItem(e, asc))
                if self.at_op(","):
                    self.take()
                    continue
                break
        if self.at_kw("SKIP"):
            self.take()
            skip = self.parse_expr()
        if self.at_kw("LIMIT"):
            self.take()
            limit = self.parse_expr()
        if not is_return and self.at_kw("WHERE"):
            self.take()
            where = self.parse_expr()
        return A.Projection(
            items, star=star, distinct=distinct, order=order, skip=skip,
            limit=limit, where=where, is_return=is_return,
        )

    def parse_return_items(self) -> List[A.ReturnItem]:
        items = []
        while True:
            start = self.peek()
            e = self.parse_expr()
            end_pos = self.peek().pos
            alias = None
            if self.at_kw("AS"):
                self.take()
                alias = self.expect_ident()
            items.append(A.ReturnItem(e, alias, self.src(start, end_pos)))
            if self.at_op(","):
                self.take()
                continue
            break
        return items

    # ---- patterns --------------------------------------------------------

    def parse_pattern(self) -> List[A.PatternPart]:
        parts = [self.parse_pattern_part()]
        while self.at_op(","):
            self.take()
            parts.append(self.parse_pattern_part())
        return parts

    def parse_pattern_part(self) -> A.PatternPart:
        path_var = None
        if self.peek().kind == "IDENT" and self.at_op("=", ahead=1) \
                and not self.at_kw("SHORTESTPATH", "ALLSHORTESTPATHS"):
            path_var = self.expect_ident()
            self.expect_op("=")
        selector = None
        if self.at_kw("SHORTESTPATH", "ALLSHORTESTPATHS"):
            kw = self.take().upper()
            selector = "shortest" if kw == "SHORTESTPATH" else "allShortest"
            self.expect_op("(")
            part = self.parse_element_chain()
            self.expect_op(")")
            part.path_var = path_var
            part.selector = selector
            part.legacy_shortest = True
            return part
        sel, sel_k = self.parse_path_selector()
        part = self.parse_element_chain()
        # an inner parenthesised `(p = ...)` declaration survives unless
        # the outer position also declared one
        part.path_var = path_var or part.path_var
        part.selector = sel
        part.selector_k = sel_k
        return part

    def parse_path_selector(self):
        """GQL path selector (CypherParser.g4:254-261): ANY SHORTEST |
        ALL SHORTEST | ANY [k] | ALL | SHORTEST [k] GROUPS | SHORTEST k,
        each with optional PATH/PATHS noise word."""

        def _noise():
            if self.at_kw("PATH", "PATHS"):
                self.take()

        def _int_opt():
            if self.peek().kind == "INT":
                return int(self.take().value)
            return None

        def _positive(k):
            if k is not None and k < 1:
                raise ParseError(
                    "the number of paths or groups in a path selector "
                    "must be a positive integer")
            return k

        if self.at_kw("ANY"):
            self.take()
            if self.at_kw("SHORTEST"):
                self.take()
                _noise()
                return "shortest", 1
            k = _positive(_int_opt())
            _noise()
            return "anyK", (k or 1)
        if self.at_kw("ALL"):
            self.take()
            if self.at_kw("SHORTEST"):
                self.take()
                _noise()
                return "allShortest", None
            _noise()
            return None, None  # ALL = default match semantics
        if self.at_kw("SHORTEST"):
            self.take()
            k = _positive(_int_opt())
            _noise()
            if self.at_kw("GROUP", "GROUPS"):
                self.take()
                return "shortestGroups", (k or 1)
            if k is None:
                raise ParseError(
                    f"SHORTEST requires a count or GROUPS at {self.peek().pos}")
            return ("shortest", 1) if k == 1 else ("shortestK", k)
        return None, None

    def _at_paren_path(self) -> bool:
        """``((`` (a quantified or plain parenthesised path) or
        ``(ident =`` (a parenthesised path with a path-variable
        declaration, ``(p = (a)-->(b))``)."""
        if not self.at_op("("):
            return False
        if self.at_op("(", ahead=1):
            return True
        return (self.peek(1).kind == "IDENT"
                and self.at_op("=", ahead=2))

    def parse_element_chain(self) -> A.PatternPart:
        elements: List[object] = []
        wheres: List[A.Expr] = []
        pv: List[Optional[str]] = [None]

        def absorb(x) -> None:
            if isinstance(x, A.PatternPart):
                # parenthesised (unquantified) path pattern: splice its
                # elements into this chain; its WHERE joins the
                # pattern-level (pre-selector) predicate
                elements.extend(x.elements)
                if x.where is not None:
                    wheres.append(x.where)
                if x.path_var:
                    pv[0] = x.path_var
            else:
                elements.append(x)

        absorb(self.parse_chain_element())
        while True:
            if self.at_op("-", "<-"):
                rel = self.parse_rel_pat()
                q = self.parse_quantifier_opt()
                if q is not None:
                    # GQL quantified-relationship shorthand -[:R]->+ —
                    # desugars to a QPP over an anonymous node pair
                    # (reference: TrailToVarExpandRewriter acts on the
                    # same desugaring)
                    elements.append(A.QPP(
                        [A.NodePat(None), rel, A.NodePat(None)], q[0], q[1]))
                    absorb(self.parse_chain_element())
                else:
                    elements.append(rel)
                    absorb(self.parse_chain_element())
            elif self._at_paren_path():
                # juxtaposed quantified path pattern: (a) ((x)-[r]->(y)){1,3}
                absorb(self.parse_qpp())
            elif elements and isinstance(elements[-1], A.QPP) and self.at_op("("):
                # juxtaposed end node after a QPP: ...){1,3} (end:Label)
                elements.append(self.parse_node_pat())
            else:
                break
        where = None
        for w in wheres:
            where = w if where is None else A.BinOp("AND", where, w)
        return A.PatternPart(elements, path_var=pv[0], where=where)

    def parse_chain_element(self):
        if self._at_paren_path():
            return self.parse_qpp()
        return self.parse_node_pat()

    def parse_qpp(self):
        """Quantified path pattern ``((a)-[r:T]->(b)){m,n}`` / ``*`` /
        ``+`` — or, when NO quantifier follows, a parenthesised path
        pattern ``( [p =] <pattern> [WHERE pred] )`` returned as a
        PatternPart for the caller to splice inline."""
        self.expect_op("(")
        pv = None
        if self.peek().kind == "IDENT" and self.at_op("=", ahead=1):
            pv = self.take().value
            self.take()  # '='
        inner = self.parse_element_chain()
        where = None
        if self.at_kw("WHERE"):
            self.take()
            where = self.parse_expr()
        self.expect_op(")")
        q = self.parse_quantifier_opt()
        if q is None:
            combined = where
            if inner.where is not None:
                combined = (inner.where if combined is None
                            else A.BinOp("AND", combined, inner.where))
            return A.PatternPart(inner.elements,
                                 path_var=pv or inner.path_var,
                                 where=combined)
        if pv is not None or inner.path_var:
            raise ParseError(
                "assigning a sub-path variable inside a quantified path "
                "pattern is not supported")
        if inner.where is not None:
            # hoist a nested parenthesised predicate into the QPP's own
            # per-repetition WHERE
            where = (inner.where if where is None
                     else A.BinOp("AND", where, inner.where))
        return A.QPP(inner.elements, q[0], q[1], where)

    def parse_quantifier_opt(self):
        """``{m,n}`` / ``{n}`` / ``*`` / ``+`` / ``?`` quantifier, or None."""
        if self.at_op("{") and (self.peek(1).kind == "INT"
                                or self.at_op(",", ahead=1)):
            self.take()
            min_r = int(self.take().value) if self.peek().kind == "INT" else 0
            if self.at_op(","):
                self.take()
                max_r = None if self.at_op("}") else int(self.take().value)
            else:
                max_r = min_r
            self.expect_op("}")
            return min_r, max_r
        if self.at_op("*"):
            self.take()
            return 0, None
        if self.at_op("+"):
            self.take()
            return 1, None
        if self.at_op("?"):
            self.take()
            return 0, 1
        return None

    def parse_label_expr(self):
        """Label expression body after the leading ``:`` — the full GQL
        algebra (CypherParser.g4 labelExpression: ``!`` > ``&``/``:`` >
        ``|``, parenthesized subexpressions, ``%`` wildcard).  Shared
        between node patterns and WHERE-position predicates (``n:A|B``).

        Returns (labels, any_labels, neg_labels, req_any, req_no, tree):
        expressions that fit the flat conjunction/disjunction fields lower
        to them (tree None, the fast planning path); anything else keeps
        the tree and exposes a shard-pruning COVER in ``labels`` — a set
        of positive labels such that every matching node carries at least
        one of them (None cover => all-shards scan + tree filter)."""
        self._lx_legacy = False   # ':' conjunction between labels
        self._lx_gpm = False      # any of & ! % ( )
        self._lx_or = False       # '|' disjunction (GPM for nodes,
        #                           flavor-neutral for rel types)
        tree = self._parse_label_or()
        return self._lower_label_tree(tree)

    def _parse_label_or(self):
        l = self._parse_label_and()
        while self.at_op("|"):
            self.take()
            self._lx_or = True
            if self.at_op(":"):  # "|:" form
                self.take()
            l = ("or", l, self._parse_label_and())
        return l

    def _parse_label_and(self):
        l = self._parse_label_factor()
        while self.at_op("&", ":"):
            t = self.take()
            if t.value == ":":
                self._lx_legacy = True
            else:
                self._lx_gpm = True
            l = ("and", l, self._parse_label_factor())
        return l

    def _parse_label_factor(self):
        if self.at_op("!"):
            self.take()
            self._lx_gpm = True
            return ("not", self._parse_label_factor())
        if self.at_op("("):
            self.take()
            self._lx_gpm = True
            t = self._parse_label_or()
            self.expect_op(")")
            return t
        if self.at_op("%"):
            self.take()
            self._lx_gpm = True
            return ("any",)
        if self.at_op("$"):
            # dynamic label $(expr) (Cypher25Parser.g4 dynamicLabelType)
            self.take()
            self.expect_op("(")
            e = self.parse_expr()
            self.expect_op(")")
            return ("dyn", e)
        return ("label", self.expect_ident())

    @staticmethod
    def _lower_rel_type_tree(tree):
        """Lower a rel-type expression tree to (types, neg_types, ttree):
        pure disjunctions of names/dynamics -> the flat union-scan list;
        one positive name with negations/wildcards -> flat + neg list
        ('%' filters nothing — every rel has a type); anything else keeps
        the exact tree (with a positive-name cover in ``types`` for shard
        pruning) and compiles to a per-row predicate on the single type
        (LabelExpressionAcceptance rel-type outlines: A&!A, A|!A, !%,
        %|!%, A|%, parenthesised groups)."""
        def disj(t):
            return disj(t[1]) + disj(t[2]) if t[0] == "or" else [t]

        def conj(t):
            return conj(t[1]) + conj(t[2]) if t[0] == "and" else [t]

        ds = disj(tree)
        if all(d[0] in ("label", "dyn") for d in ds):
            return [d[1] for d in ds], [], None
        if len(ds) == 1:
            cs = conj(tree)
            pos = [c for c in cs if c[0] in ("label", "dyn")]
            negs = [c for c in cs if c[0] == "not"
                    and c[1][0] in ("label", "dyn")]
            anys = [c for c in cs if c[0] == "any"]
            if (len(pos) + len(negs) + len(anys) == len(cs)
                    and len(pos) <= 1):
                return ([p[1] for p in pos], [n[1][1] for n in negs],
                        None)

        def has_dyn(t):
            if t[0] == "dyn":
                return True
            return any(has_dyn(x) for x in t[1:]
                       if isinstance(x, tuple))

        if has_dyn(tree):
            raise ParseError(
                "dynamic relationship types $(expr) are only supported "
                "in simple (disjunction / single-negation) form")

        def cover(t):
            if t[0] == "label":
                return {t[1]}
            if t[0] == "or":
                a, b = cover(t[1]), cover(t[2])
                return None if a is None or b is None else a | b
            if t[0] == "and":
                a, b = cover(t[1]), cover(t[2])
                return a if a is not None else b
            return None

        cov = cover(tree)
        return (sorted(cov) if cov else [], [], tree)

    @staticmethod
    def _lower_label_tree(tree):
        def conjuncts(t):
            if t[0] == "and":
                return conjuncts(t[1]) + conjuncts(t[2])
            return [t]

        def disjuncts(t):
            if t[0] == "or":
                return disjuncts(t[1]) + disjuncts(t[2])
            return [t]

        ds = disjuncts(tree)
        if len(ds) > 1 and all(d[0] == "label" for d in ds):
            return [d[1] for d in ds], True, [], False, False, None
        if len(ds) == 1:
            labels, neg = [], []
            req_any = req_no = False
            flat = True
            for c in conjuncts(tree):
                if c[0] == "label":
                    labels.append(c[1])
                elif c[0] == "any":
                    req_any = True
                elif c[0] == "not" and c[1][0] == "label":
                    neg.append(c[1][1])
                elif c[0] == "not" and c[1][0] == "any":
                    req_no = True
                else:
                    flat = False
                    break
            if flat:
                return labels, False, neg, req_any, req_no, None

        def cover(t):
            if t[0] == "label":
                return {t[1]}
            if t[0] == "or":
                a, b = cover(t[1]), cover(t[2])
                return None if a is None or b is None else a | b
            if t[0] == "and":
                a, b = cover(t[1]), cover(t[2])
                return a if a is not None else b
            return None  # not / %

        cov = cover(tree)
        labels = sorted(cov) if cov else []
        return labels, len(labels) > 1, [], False, False, tree

    def parse_node_pat(self) -> A.NodePat:
        self.expect_op("(")
        var = None
        if self.peek().kind == "IDENT" and not self.at_kw("WHERE") \
                and not (self.at_kw("IS")
                         and self.peek(1).kind == "IDENT"):
            # `(IS A)` is an anonymous node with an IS label introducer,
            # not a variable named IS (Cypher25Parser.g4 nodePattern)
            var = self.expect_ident()
        labels: List[str] = []
        neg_labels: List[str] = []
        any_labels = False
        req_any = req_no = False
        ltree = None
        lx_legacy = lx_gpm = False
        if self.at_op(":") or self.at_kw("IS"):
            # GQL `(n IS Label)` introducer == `(n:Label)`
            used_is = self.at_kw("IS")
            self.take()
            labels, any_labels, neg_labels, req_any, req_no, ltree = \
                self.parse_label_expr()
            lx_legacy = self._lx_legacy
            lx_gpm = self._lx_gpm or self._lx_or or used_is
        props = None
        if self.at_op("{"):
            props = self.parse_map_literal()
        elif self.peek().kind == "PARAM":
            props = A.Param(self.take().value)  # (n:L $props)
        where = None
        if self.at_kw("WHERE"):
            self.take()
            where = self.parse_expr()
        self.expect_op(")")
        return A.NodePat(var, labels, any_labels, props, where,
                         neg_labels, req_any, req_no, label_tree=ltree,
                         lx_legacy=lx_legacy, lx_gpm=lx_gpm)

    def parse_rel_pat(self) -> A.RelPat:
        direction = "both"
        if self.at_op("<-"):
            self.take()
            direction = "in"
        else:
            self.expect_op("-")
        var = None
        types: List[str] = []
        neg_types: List[str] = []
        props = None
        where = None
        min_len = max_len = None
        var_length = False
        lx_gpm = False
        ttree = None
        if self.at_op("["):
            self.take()
            if self.peek().kind == "IDENT" and not self.at_kw("WHERE") \
                    and not (self.at_kw("IS")
                             and self.peek(1).kind == "IDENT"):
                # `[IS R]` = anonymous rel with IS type introducer
                var = self.expect_ident()
            ttree = None
            if self.at_op(":") or self.at_kw("IS"):
                lx_gpm = lx_gpm or self.at_kw("IS")
                self.take()
                # full type-expression algebra via the shared label parser
                # (CypherParser.g4: one relTypeExpression grammar) — then
                # lowered to the rel-specific flat fields where possible;
                # '|' between rel types is flavor-neutral
                self._lx_legacy = self._lx_gpm = self._lx_or = False
                tree = self._parse_label_or()
                lx_gpm = lx_gpm or self._lx_gpm
                types, neg_types, ttree = self._lower_rel_type_tree(tree)
            if self.at_op("*"):
                self.take()
                var_length = True
                if self.peek().kind == "INT":
                    min_len = int(self.take().value)
                    if self.at_op(".."):
                        self.take()
                        if self.peek().kind == "INT":
                            max_len = int(self.take().value)
                    else:
                        max_len = min_len
                elif self.at_op(".."):
                    self.take()
                    if self.peek().kind == "INT":
                        max_len = int(self.take().value)
            if self.at_op("{"):
                props = self.parse_map_literal()
            elif self.peek().kind == "PARAM":
                props = A.Param(self.take().value)  # [r:T $props]
            if self.at_kw("WHERE"):
                self.take()
                where = self.parse_expr()
            self.expect_op("]")
        if self.at_op("->"):
            self.take()
            if direction == "in":
                raise ParseError("<-...-> not allowed")
            direction = "out"
        else:
            self.expect_op("-")
            # direction stays 'in' or 'both'
        return A.RelPat(var, types, direction, props, min_len, max_len,
                        var_length, where, neg_types, ttree,
                        lx_gpm=lx_gpm)

    def parse_map_literal(self) -> A.MapLit:
        self.expect_op("{")
        items: List[Tuple[str, A.Expr]] = []
        if not self.at_op("}"):
            while True:
                key = self.expect_ident()
                self.expect_op(":")
                items.append((key, self.parse_expr()))
                if self.at_op(","):
                    self.take()
                    continue
                break
        self.expect_op("}")
        return A.MapLit(items)

    # ---- expressions -----------------------------------------------------

    def parse_expr(self) -> A.Expr:
        return self.parse_or()

    def parse_or(self) -> A.Expr:
        e = self.parse_xor()
        while self.at_kw("OR"):
            self.take()
            e = A.BinOp("OR", e, self.parse_xor())
        return e

    def parse_xor(self) -> A.Expr:
        e = self.parse_and()
        while self.at_kw("XOR"):
            self.take()
            e = A.BinOp("XOR", e, self.parse_and())
        return e

    def parse_and(self) -> A.Expr:
        e = self.parse_not()
        while self.at_kw("AND"):
            self.take()
            e = A.BinOp("AND", e, self.parse_not())
        return e

    def parse_not(self) -> A.Expr:
        if self.at_kw("NOT"):
            self.take()
            return A.UnaryOp("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> A.Expr:
        left = self.parse_predicate_ops()
        comps = []
        while self.at_op("=", "<>", "<", "<=", ">", ">="):
            op = self.take().value
            right = self.parse_predicate_ops()
            comps.append((op, right))
        if not comps:
            return left
        # chained comparison: a < b <= c  =>  a<b AND b<=c
        exprs = []
        cur = left
        for op, right in comps:
            exprs.append(A.BinOp(op, cur, right))
            cur = right
        e = exprs[0]
        for nxt in exprs[1:]:
            e = A.BinOp("AND", e, nxt)
        return e

    def parse_predicate_ops(self) -> A.Expr:
        e = self.parse_additive()
        while True:
            if self.at_kw("IN"):
                self.take()
                e = A.BinOp("IN", e, self.parse_additive())
            elif self.at_kw("STARTS"):
                self.take()
                self.expect_kw("WITH")
                e = A.BinOp("STARTSWITH", e, self.parse_additive())
            elif self.at_kw("ENDS"):
                self.take()
                self.expect_kw("WITH")
                e = A.BinOp("ENDSWITH", e, self.parse_additive())
            elif self.at_kw("CONTAINS"):
                self.take()
                e = A.BinOp("CONTAINS", e, self.parse_additive())
            elif self.at_op("=~"):
                self.take()
                e = A.BinOp("=~", e, self.parse_additive())
            elif self.at_kw("IS"):
                self.take()
                negated = False
                if self.at_kw("NOT"):
                    self.take()
                    negated = True
                if self.at_op(":") or self.at_kw("TYPED"):
                    # x IS [NOT] :: TYPE / x IS [NOT] TYPED TYPE
                    if self.at_op(":"):
                        self.take()
                        self.expect_op(":")
                    else:
                        self.take()
                    e = A.IsTyped(e, self._parse_type_name(), negated)
                elif self.at_kw("NORMALIZED", "NFC", "NFD", "NFKC", "NFKD"):
                    # x IS [NOT] [form] NORMALIZED (extendedWhen WhenForm):
                    # true iff x equals its form-normalization
                    form = "NFC"
                    if not self.at_kw("NORMALIZED"):
                        form = self.take().value.upper()
                    self.expect_kw("NORMALIZED")
                    eq = A.BinOp("=", e, A.Func(
                        "normalize", [e, A.Var(form)]))
                    e = A.UnaryOp("NOT", eq) if negated else eq
                else:
                    self.expect_kw("NULL")
                    e = A.IsNull(e, negated)
            else:
                return e

    _TWO_WORD_TYPES = {("LOCAL", "DATETIME"), ("ZONED", "DATETIME"),
                       ("LOCAL", "TIME"), ("ZONED", "TIME")}

    def _parse_type_name(self) -> str:
        """Cypher type name for IS :: — one or two words, LIST<inner>
        element types are accepted and ignored (we check the outer shape)."""
        first = self.expect_ident().upper()
        if (self.peek().kind == "IDENT"
                and (first, self.peek().upper()) in self._TWO_WORD_TYPES):
            first = f"{first} {self.take().value.upper()}"
        if first in ("LIST", "ARRAY", "MAP") and self.at_op("<"):
            depth = 0
            while True:
                t = self.take()
                if t.kind == "EOF":
                    raise ParseError("unterminated < in type name")
                if t.kind == "OP" and t.value == "<":
                    depth += 1
                elif t.kind == "OP" and t.value == ">":
                    depth -= 1
                    if depth == 0:
                        break
        if self.at_kw("NOT"):  # `TYPE NOT NULL` suffix
            self.take()
            self.expect_kw("NULL")
            first += " NOT NULL"
        return first

    def parse_additive(self) -> A.Expr:
        e = self.parse_multiplicative()
        while self.at_op("+", "-", "||"):
            # || keeps its own op: concatenation never coerces (the
            # compiler type-checks it), unlike the lenient +
            op = self.take().value
            e = A.BinOp(op, e, self.parse_multiplicative())
        return e

    def parse_multiplicative(self) -> A.Expr:
        e = self.parse_unary()
        while self.at_op("*", "/", "%"):
            op = self.take().value
            e = A.BinOp(op, e, self.parse_unary())
        return e

    def parse_unary(self) -> A.Expr:
        # unary minus binds LOOSER than ^ (Cypher: -2^2 = -(2^2) = -4)
        if self.at_op("-"):
            self.take()
            t = self.peek()
            if t.kind == "INT" and not self.at_op("^", ahead=1):
                # fold the sign into the literal so Long.MIN parses
                # (SignedDecimalIntegerLiteral, CypherParser.g4 admits
                # -9223372036854775808; ^ keeps NEG looser than power)
                self.take()
                v = -int(t.value)
                if v < -(2 ** 63):
                    raise ParseError(
                        f"integer, -{t.value}, is too large")
                return A.Lit(v)
            return A.UnaryOp("NEG", self.parse_unary())
        if self.at_op("+"):
            self.take()
            return self.parse_unary()
        return self.parse_power()

    def parse_power(self) -> A.Expr:
        e = self.parse_postfix()
        if self.at_op("^"):
            self.take()
            # right-assoc; RHS may itself be signed (2 ^ -3)
            return A.BinOp("^", e, self.parse_unary())
        return e

    def parse_postfix(self) -> A.Expr:
        e = self.parse_atom()
        while True:
            if self.at_op("."):
                self.take()
                e = A.Prop(e, self.expect_ident())
            elif self.at_op("["):
                self.take()
                if self.at_op(".."):  # l[..hi]
                    self.take()
                    hi = None if self.at_op("]") else self.parse_expr()
                    self.expect_op("]")
                    e = A.Slice(e, None, hi)
                    continue
                idx = self.parse_expr()
                if self.at_op(".."):
                    self.take()
                    hi = None if self.at_op("]") else self.parse_expr()
                    self.expect_op("]")
                    e = A.Slice(e, idx, hi)
                else:
                    self.expect_op("]")
                    e = A.Index(e, idx)
            elif self.at_op(":") and isinstance(e, A.Var):
                self.take()
                labels, any_l, neg_l, req_any, req_no, ltree = \
                    self.parse_label_expr()
                e = A.HasLabels(e, labels, any_l, neg_l, req_any, req_no,
                                label_tree=ltree,
                                lx_legacy=self._lx_legacy,
                                lx_gpm=self._lx_gpm or self._lx_or)
            elif self.at_op("{") and isinstance(e, A.Var):
                e = self.parse_map_projection(e.name)
            else:
                return e

    def parse_map_projection(self, var: str) -> A.MapProjection:
        self.expect_op("{")
        items: List[tuple] = []
        if not self.at_op("}"):
            while True:
                if self.at_op("."):
                    self.take()
                    if self.at_op("*"):
                        self.take()
                        items.append(("all",))
                    else:
                        items.append(("prop", self.expect_ident()))
                elif self.peek().kind == "IDENT" and self.at_op(":", ahead=1):
                    k = self.expect_ident()
                    self.take()
                    items.append(("kv", k, self.parse_expr()))
                else:
                    items.append(("var", self.expect_ident()))
                if self.at_op(","):
                    self.take()
                    continue
                break
        self.expect_op("}")
        return A.MapProjection(var, items)

    # ---- atoms -----------------------------------------------------------

    def try_parse_pattern_pred(self) -> Optional[A.PatternPart]:
        """Attempt to parse a relationship pattern used as a predicate."""
        save = self.i
        try:
            part = self.parse_element_chain()
            if len(part.elements) > 1:
                return part
        except (ParseError, Exception):
            pass
        self.i = save
        return None

    def parse_atom(self) -> A.Expr:
        t = self.peek()
        if t.kind == "INT":
            self.take()
            v = int(t.value)
            if v > 2 ** 63 - 1:
                raise ParseError(f"integer, {t.value}, is too large")
            return A.Lit(v)
        if t.kind == "FLOAT":
            self.take()
            return A.Lit(float(t.value))
        if t.kind == "STRING":
            self.take()
            return A.Lit(t.value)
        if t.kind == "PARAM":
            self.take()
            return A.Param(t.value)
        if self.at_op("("):
            pat = self.try_parse_pattern_pred()
            if pat is not None:
                return A.PatternPred(pat)
            self.take()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if self.at_op("["):
            return self.parse_list_like()
        if self.at_op("{"):
            return self.parse_map_literal()
        if t.kind == "IDENT":
            kw = t.upper()
            if kw == "TRUE":
                self.take()
                return A.Lit(True)
            if kw == "FALSE":
                self.take()
                return A.Lit(False)
            if kw == "NULL":
                self.take()
                return A.Lit(None)
            if kw == "CASE":
                return self.parse_case()
            if kw in ("SHORTESTPATH", "ALLSHORTESTPATHS") \
                    and self.at_op("(", ahead=1):
                # shortestPath(...) in EXPRESSION position — a path value
                # (NestedPlanExpression in the reference planner)
                self.take()
                self.expect_op("(")
                part = self.parse_element_chain()
                self.expect_op(")")
                part.selector = ("shortest" if kw == "SHORTESTPATH"
                                 else "allShortest")
                part.legacy_shortest = True
                return A.ShortestPathExpr(part)
            if kw == "COUNT" and self.at_op("(", ahead=1) and self.at_op("*", ahead=2):
                self.take(); self.take(); self.take()
                self.expect_op(")")
                return A.CountStar()
            if kw == "COLLECT" and self.at_op("{", ahead=1):
                self.take()
                self.expect_op("{")
                sub = self._parse_union_body()
                self.expect_op("}")
                return A.CollectSub(sub)
            if kw in ("EXISTS", "COUNT") and self.at_op("{", ahead=1):
                self.take()
                self.expect_op("{")
                save = self.i
                try:  # fast path: single pattern [WHERE] [RETURN items]
                    if self.at_kw("MATCH"):
                        self.take()
                    pattern = self.parse_pattern()
                    where = None
                    if self.at_kw("WHERE"):
                        self.take()
                        where = self.parse_expr()
                    if self.at_kw("RETURN"):
                        # tolerated, ignored result — UNLESS it aggregates:
                        # `RETURN count(…)` always emits one row, so the
                        # body's cardinality is no longer the pattern's
                        # (ExistsExpressionAcceptance 'EXISTS subquery with
                        # aggregation inside') — route to the full-query path
                        self.take()
                        ritems = self.parse_return_items()
                        from .exprs import contains_aggregate
                        if any(contains_aggregate(it.expr)
                               for it in ritems):
                            raise ParseError("aggregating RETURN body")
                    self.expect_op("}")
                    return (A.ExistsSub(pattern, where) if kw == "EXISTS"
                            else A.CountSub(pattern, where))
                except ParseError:
                    self.i = save
                # full-query body (multiple clauses, UNION, WITH, ...)
                body = self._parse_union_body()
                self.expect_op("}")
                return (A.ExistsSub([], None, body) if kw == "EXISTS"
                        else A.CountSub([], None, body))
            if kw in ("ALL", "ANY", "NONE", "SINGLE") and self.at_op("(", ahead=1):
                self.take()
                self.expect_op("(")
                var = self.expect_ident()
                self.expect_kw("IN")
                source = self.parse_expr()
                self.expect_kw("WHERE")
                pred = self.parse_expr()
                self.expect_op(")")
                return A.Quantifier(kw.lower(), var, source, pred)
            if kw == "REDUCE" and self.at_op("(", ahead=1):
                self.take()
                self.expect_op("(")
                acc = self.expect_ident()
                self.expect_op("=")
                init = self.parse_expr()
                self.expect_op(",")
                var = self.expect_ident()
                self.expect_kw("IN")
                source = self.parse_expr()
                self.expect_op("|")
                body = self.parse_expr()
                self.expect_op(")")
                return A.Reduce(acc, init, var, source, body)
            # function call (possibly dotted) or variable
            if self.at_op("(", ahead=1):
                name = self.expect_ident()
                return self.parse_func_call(name)
            if self.at_op(".", ahead=1) and self._dotted_call_ahead():
                # dotted function: ns.part(...)* — only if a '(' terminates the chain
                save = self.i
                parts = [self.expect_ident()]
                while self.at_op(".") and self.peek(1).kind == "IDENT":
                    self.take()
                    parts.append(self.expect_ident())
                if self.at_op("("):
                    return self.parse_func_call(".".join(parts))
                self.i = save
            name = self.expect_ident()
            return A.Var(name)
        raise ParseError(f"unexpected token {t.value!r} at {t.pos}")

    def _dotted_call_ahead(self) -> bool:
        """True iff the upcoming tokens are IDENT (. IDENT)+ ( — a dotted
        function call.  Property access never has a '(' after the chain,
        and Cypher has no method invocation, so this is unambiguous (and
        lets registered user functions use any namespace)."""
        if self.peek().kind != "IDENT":
            return False
        j = 1
        seen_dot = False
        while self.at_op(".", ahead=j) and self.peek(j + 1).kind == "IDENT":
            seen_dot = True
            j += 2
        return seen_dot and self.at_op("(", ahead=j)

    def parse_func_call(self, name: str) -> A.Expr:
        self.expect_op("(")
        if name.lower() == "trim" and not self.at_op(")"):
            # SQL-style trim([[BOTH|LEADING|TRAILING] [char] FROM] input)
            # (CypherFunctions.java:728-758 trim-char variants)
            mode = None
            if self.at_kw("BOTH", "LEADING", "TRAILING"):
                mode = self.take().upper()
            first = None
            if not self.at_kw("FROM"):
                first = self.parse_expr()
            if self.at_kw("FROM"):
                self.take()
                src = self.parse_expr()
                self.expect_op(")")
                fname = {"LEADING": "ltrim",
                         "TRAILING": "rtrim"}.get(mode or "BOTH", "btrim")
                return A.Func(fname,
                              [src] + ([first] if first is not None else []))
            self.expect_op(")")
            return A.Func("trim", [first])
        distinct = False
        if self.at_kw("DISTINCT"):
            self.take()
            distinct = True
        args: List[A.Expr] = []
        if not self.at_op(")"):
            args = self.parse_expr_list()
        self.expect_op(")")
        lname = name.lower()
        if lname == "exists" and len(args) == 1 and isinstance(args[0], A.PatternPred):
            return A.ExistsSub([args[0].pattern], None)
        return A.Func(lname, args, distinct)

    def parse_list_like(self) -> A.Expr:
        self.expect_op("[")
        if self.at_op("]"):
            self.take()
            return A.ListLit([])
        # pattern comprehension: [ (a)-[...]->(b) WHERE ... | expr ],
        # optionally binding a path variable: [ p = (a)-->(b) | len(p) ]
        has_path_var = (self.peek().kind == "IDENT"
                        and self.at_op("=", ahead=1)
                        and self.at_op("(", ahead=2))
        if self.at_op("(") or has_path_var:
            save = self.i
            pvar = None
            if has_path_var:
                pvar = self.expect_ident()
                self.take()  # '='
            pat = self.try_parse_pattern_pred()
            if pat is not None and (self.at_kw("WHERE") or self.at_op("|")):
                pat.path_var = pvar
                where = None
                if self.at_kw("WHERE"):
                    self.take()
                    where = self.parse_expr()
                self.expect_op("|")
                proj = self.parse_expr()
                self.expect_op("]")
                return A.PatternComp(pat, where, proj)
            self.i = save
        # list comprehension: [x IN list ...]
        if self.peek().kind == "IDENT" and self.at_kw("IN", ahead=1):
            var = self.expect_ident()
            self.expect_kw("IN")
            source = self.parse_expr()
            where = None
            proj = None
            if self.at_kw("WHERE"):
                self.take()
                where = self.parse_expr()
            if self.at_op("|"):
                self.take()
                proj = self.parse_expr()
            self.expect_op("]")
            return A.ListComp(var, source, where, proj)
        items = [self.parse_expr()]
        while self.at_op(","):
            self.take()
            items.append(self.parse_expr())
        self.expect_op("]")
        return A.ListLit(items)

    def parse_case(self) -> A.Expr:
        self.expect_kw("CASE")
        operand = None
        if not self.at_kw("WHEN"):
            operand = self.parse_expr()
        whens: List[Tuple[A.Expr, A.Expr]] = []
        extended = False
        while self.at_kw("WHEN"):
            self.take()
            if operand is None:
                cond = self.parse_expr()
            else:
                # extended simple CASE (Cypher 5): WHEN may carry a
                # predicate fragment applied to the operand — comma-
                # separated alternatives OR together
                cond = None
                while True:
                    c, ext = self.parse_case_when_alt(operand)
                    extended = extended or ext
                    cond = c if cond is None else A.BinOp("OR", cond, c)
                    if self.at_op(","):
                        self.take()
                        extended = True
                        continue
                    break
            self.expect_kw("THEN")
            whens.append((cond, self.parse_expr()))
        default = None
        if self.at_kw("ELSE"):
            self.take()
            default = self.parse_expr()
        self.expect_kw("END")
        if operand is not None and extended:
            # desugared to a searched CASE over full predicates
            return A.Case(None, whens, default)
        if operand is not None:
            # classic simple CASE: unwrap the = conds back to bare values
            whens = [(c.right, v) for c, v in whens]
        return A.Case(operand, whens, default)

    def parse_case_when_alt(self, operand: A.Expr):
        """One WHEN alternative of an extended simple CASE; returns
        (predicate, is_extended_form)."""
        if self.at_op("<", "<=", ">", ">=", "=", "<>"):
            op = self.take().value
            return A.BinOp(op, operand, self.parse_expr()), True
        if self.at_op("=~"):
            self.take()
            return A.BinOp("=~", operand, self.parse_expr()), True
        if self.at_kw("IS"):
            self.take()
            neg = False
            if self.at_kw("NOT"):
                self.take()
                neg = True
            if self.at_op(":"):  # '::' arrives as two ':' tokens
                self.take()
                self.expect_op(":")
                return A.IsTyped(operand, self._parse_type_name(), neg), True
            if self.at_kw("NORMALIZED", "NFC", "NFD", "NFKC", "NFKD"):
                form = "NFC"
                if not self.at_kw("NORMALIZED"):
                    form = self.take().value.upper()
                self.expect_kw("NORMALIZED")
                eq = A.BinOp("=", operand,
                             A.Func("normalize", [operand, A.Var(form)]))
                return (A.UnaryOp("NOT", eq) if neg else eq), True
            if self.at_kw("TYPED"):
                self.take()
                return A.IsTyped(operand, self._parse_type_name(), neg), True
            self.expect_kw("NULL")
            return A.IsNull(operand, negated=neg), True
        if self.at_kw("IN"):
            self.take()
            return A.BinOp("IN", operand, self.parse_expr()), True
        if self.at_kw("STARTS"):
            self.take()
            self.expect_kw("WITH")
            return A.BinOp("STARTSWITH", operand, self.parse_expr()), True
        if self.at_kw("ENDS"):
            self.take()
            self.expect_kw("WITH")
            return A.BinOp("ENDSWITH", operand, self.parse_expr()), True
        if self.at_kw("CONTAINS"):
            self.take()
            return A.BinOp("CONTAINS", operand, self.parse_expr()), True
        return A.BinOp("=", operand, self.parse_expr()), False


def parse(text: str):
    return Parser(text).parse_query()
