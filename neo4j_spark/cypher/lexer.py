"""Cypher tokenizer.

Token classes follow the reference grammar
(reference: ``community/cypher/front-end/antlr-parser/src/main/antlr4/org/neo4j/cypher/internal/parser/CypherParser.g4``):
identifiers (plain + backtick-escaped), string literals with escapes, numeric
literals (int/float/hex/octal/scientific), parameters ``$name``, and the
multi-char operators.  Keywords are case-insensitive and returned as IDENT —
the parser decides keyword-ness contextually (Cypher keywords are reserved
only contextually).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional


@dataclass
class Token:
    kind: str  # IDENT STRING INT FLOAT PARAM OP EOF
    value: str
    pos: int

    def upper(self) -> str:
        return self.value.upper()


OPS3 = ("<=>",)
OPS2 = ("<>", "<=", ">=", "=~", "..", "+=", "->", "<-", "||")
OPS1 = "()[]{},.:|^+-*/%=<>!$&?"


class LexError(ValueError):
    pass


def tokenize(text: str) -> List[Token]:
    toks: List[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        # comments
        if c == "/" and i + 1 < n and text[i + 1] == "/":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "*":
            j = text.find("*/", i)
            if j < 0:
                raise LexError(f"unterminated comment at {i}")
            i = j + 2
            continue
        # strings
        if c in ("'", '"'):
            quote = c
            j = i + 1
            buf = []
            while j < n:
                ch = text[j]
                if ch == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    mapping = {
                        "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
                        "'": "'", '"': '"', "\\": "\\",
                    }
                    if esc == "u" and j + 5 < n:
                        buf.append(chr(int(text[j + 2 : j + 6], 16)))
                        j += 6
                        continue
                    buf.append(mapping.get(esc, esc))
                    j += 2
                    continue
                if ch == quote:
                    break
                buf.append(ch)
                j += 1
            if j >= n:
                raise LexError(f"unterminated string at {i}")
            toks.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        # backtick identifier
        if c == "`":
            j = text.find("`", i + 1)
            if j < 0:
                raise LexError(f"unterminated backtick at {i}")
            toks.append(Token("IDENT", text[i + 1 : j], i))
            i = j + 1
            continue
        # numbers — underscores are digit separators (CypherParser.g4
        # DECIMAL_DOUBLE/UNSIGNED_DECIMAL_INTEGER; LiteralAcceptance):
        # allowed only BETWEEN digits of a run — never leading, trailing,
        # doubled, or adjacent to the 0x/0o prefix
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):

            def digit_run(j: int, charset: str) -> int:
                seen, last_us = False, False
                while j < n and (text[j] in charset or text[j] == "_"):
                    if text[j] == "_":
                        if not seen or last_us:
                            raise LexError(
                                f"invalid underscore placement in "
                                f"numeric literal at {j}")
                        last_us = True
                    else:
                        seen, last_us = True, False
                    j += 1
                if last_us:
                    raise LexError(
                        f"numeric literal may not end with an "
                        f"underscore at {j}")
                return j

            j = i
            is_float = False
            if text.startswith("0x", i) or text.startswith("0X", i):
                j = digit_run(i + 2, "0123456789abcdefABCDEF")
                if j == i + 2:
                    raise LexError(f"invalid hexadecimal literal at {i}")
                toks.append(Token(
                    "INT", str(int(text[i:j].replace("_", ""), 16)), i))
                i = j
                continue
            if text.startswith("0o", i) or text.startswith("0O", i):
                j = digit_run(i + 2, "01234567")
                if j == i + 2:
                    raise LexError(f"invalid octal literal at {i}")
                toks.append(Token(
                    "INT", str(int(text[i + 2:j].replace("_", ""), 8)), i))
                i = j
                continue
            j = digit_run(j, "0123456789")
            int_part = text[i:j]
            # ".." range operator must not be eaten as a float
            if j < n and text[j] == "." and not text.startswith("..", j):
                if j + 1 < n and (text[j + 1].isdigit()):
                    is_float = True
                    j = digit_run(j + 1, "0123456789")
            if j < n and text[j] in "eE":
                k = j + 1
                if k < n and text[k] in "+-":
                    k += 1
                if k < n and text[k].isdigit():
                    is_float = True
                    j = digit_run(k, "0123456789")
            if (int_part.startswith("0") and "_" in int_part
                    and int_part.replace("_", "") != "0"):
                # 0_7 / 01_2: deprecated leading-zero octal syntax may
                # not carry separators (LiteralAcceptance scenario 25)
                raise LexError(
                    f"underscore in deprecated octal literal at {i}")
            lit = text[i:j].replace("_", "")
            if is_float and j < n and text[j] in "fF" \
                    and not (j + 1 < n and (text[j + 1].isalnum()
                                            or text[j + 1] == "_")):
                # float suffix 1.0f (CypherParser.g4 DECIMAL_DOUBLE;
                # NaNAcceptance.feature uses it) — value is unchanged
                j += 1
            toks.append(Token("FLOAT" if is_float else "INT", lit, i))
            i = j
            continue
        # identifiers / keywords
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            toks.append(Token("IDENT", text[i:j], i))
            i = j
            continue
        # parameters
        if c == "$":
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            if j == i + 1:
                if j < n and text[j] == "(":
                    # dynamic label/type expression $(expr)
                    # (Cypher25Parser.g4 dynamicLabelType): emit a DOLLAR
                    # op; the parser pairs it with the parenthesized expr
                    toks.append(Token("OP", "$", i))
                    i = j
                    continue
                raise LexError(f"bad parameter at {i}")
            toks.append(Token("PARAM", text[i + 1 : j], i))
            i = j
            continue
        # operators
        matched = False
        for op in OPS3 + OPS2:
            if text.startswith(op, i):
                toks.append(Token("OP", op, i))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        if c in OPS1:
            toks.append(Token("OP", c, i))
            i += 1
            continue
        raise LexError(f"unexpected character {c!r} at {i}")
    toks.append(Token("EOF", "", n))
    return toks
