"""Pure-Python reference implementation of the R1-R4 semantics (SURVEY.md
7.0) — an independent oracle for randomized testing. Deliberately naive
(set fixpoints), no Spark, no SQL.

Output semantics mirror the reference (RelationGraph.scala processSubclasses
/ processRestriction):
- unsatisfiability: c unsat if c ⊑* Nothing, plus the EL bottom rule
  (x ⊑* s, some(s,p,f), f unsat => x unsat), iterated;
- rows whose OBJECT class is unsat are suppressed; unsat SUBJECTS are kept;
- equivalence_as_subclass=True (reference default): mutual pairs emit two
  subClassOf rows; False: owl:equivalentClass rows instead, and reflexive
  rows also use owl:equivalentClass (adjustedEquivs includes the concept).
"""

from relation_graph_spark import tokens as T


def materialize_py(
    rows, output_subclasses=True, reflexive=False, equivalence_as_subclass=True
):
    sc, some, def_some, sp = set(), set(), set(), set()
    classes, props = set(), set()
    for r in rows:
        a = r[0]
        if a == T.AX_SUBCLASS:
            sc.add((r[1], r[2])); classes |= {r[1], r[2]}
        elif a == T.AX_EQUIV_NAMED:
            sc.add((r[1], r[2])); sc.add((r[2], r[1])); classes |= {r[1], r[2]}
        elif a == T.AX_SOME:
            some.add((r[1], r[2], r[3])); classes |= {r[1], r[3]}; props.add(r[2])
        elif a == T.AX_EQUIV_SOME:
            def_some.add((r[1], r[2], r[3]))
            some.add((r[1], r[2], r[3]))
            classes |= {r[1], r[3]}; props.add(r[2])
        elif a == T.AX_SUBPROP:
            sp.add((r[1], r[2])); props |= {r[1], r[2]}
        elif a == T.AX_DECL_CLASS:
            classes.add(r[1])
        elif a == T.AX_DECL_PROP:
            props.add(r[1])

    def tc(edges):
        c = set(edges)
        while True:
            new = {(x, z) for (x, y) in c for (y2, z) in edges if y == y2} - c
            if not new:
                return c
            c |= new

    sp_tc = tc(sp)
    sp_star = sp_tc | {(p, p) for p in props}

    while True:
        sc_tc = tc(sc)
        sc_star = sc_tc | {(c, c) for c in classes} | {(c, T.TOP) for c in classes}
        rel = {
            (x, p, o)
            for (s, q, f) in some
            for (x, s2) in sc_star if s2 == s
            for (q2, p) in sp_star if q2 == q
            for (f2, o) in sc_star if f2 == f
        }
        new_sc = {
            (x, fc)
            for (x, p, y) in rel
            for (fc, p2, y2) in def_some
            if p2 == p and y2 == y and x != fc
        } - sc
        if not new_sc:
            break
        sc |= new_sc

    # EL bottom rules: told-Nothing paths seed, then filler-unsat propagates
    unsat = {x for (x, y) in sc_star if y == T.BOT}
    while True:
        bad_subjects = {s for (s, p, f) in some if f in unsat}
        new = {x for (x, y) in sc_star if y in bad_subjects} - unsat
        if not new:
            break
        unsat |= new

    builtin = {T.TOP, T.BOT}
    # object-side unsat suppression; unsat subjects kept (reference parity)
    out = {
        (s, p, o)
        for (s, p, o) in rel
        if s not in builtin and o not in builtin and p not in builtin
        and o not in unsat
    }
    if output_subclasses:
        pairs = {
            (a, b)
            for (a, b) in sc_tc
            if a != b and a not in builtin and b not in builtin and b not in unsat
        }
        if equivalence_as_subclass:
            out |= {(a, T.SUBCLASSOF, b) for (a, b) in pairs}
        else:
            mutual = {(a, b) for (a, b) in pairs if (b, a) in pairs}
            out |= {(a, T.SUBCLASSOF, b) for (a, b) in pairs - mutual}
            out |= {(a, T.EQUIVALENTCLASS, b) for (a, b) in mutual}
        if reflexive:
            refl_pred = T.SUBCLASSOF if equivalence_as_subclass else T.EQUIVALENTCLASS
            out |= {
                (c, refl_pred, c)
                for c in classes
                if c not in builtin and c not in unsat
            }
    return out
