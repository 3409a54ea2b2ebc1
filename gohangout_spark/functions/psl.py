"""Public-Suffix-List registrable domains, scan-side (VERDICT r7 #5).

The PSL (publicsuffix.org — public, CC-BY-SA data) is DATA plus a tiny
ALGORITHM. This module implements the algorithm COMPLETELY — longest
matching rule wins, ``*.`` wildcard rules, ``!`` exception rules beat
everything, unlisted TLDs fall to the implicit ``*`` default rule — and
vendors a snapshot SUBSET of the list in the PSL's own file format
(comments, ICANN/PRIVATE sections, wildcard/exception syntax), so
dropping in the full upstream file is a one-constant change with zero
code edits. The snapshot carries the multi-label families that change
answers versus naive last-two-labels (cc-SLDs like co.uk / com.au /
co.jp, the US k12/state system, full-wildcard TLDs like *.ck with the
!www.ck exception, the Japanese city wildcards, and well-known
PRIVATE-section hosts like github.io) — plain single-label TLDs need no
entry because the default rule already yields them.

Scale shape: rule sets compile to Catalyst ``IN <literal list>``
predicates — the optimizer turns lists this size into InSet hash
lookups inside whole-stage codegen, so registrable-domain extraction is
a zero-shuffle scan-side projection at any corpus size (no UDF, no
join). ``registrable_domain_sql`` renders the same decision as a
DuckDB CASE over the same rule data, so driver oracles replay the
algorithm independently of Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- snapshot

PSL_SNAPSHOT = """\
// Public Suffix List snapshot subset (format: publicsuffix.org/list/)
// Single-label TLDs are intentionally omitted: the implicit default
// rule "*" already makes every unlisted TLD a public suffix.
// ===BEGIN ICANN DOMAINS===
// uk
ac.uk
co.uk
gov.uk
ltd.uk
me.uk
net.uk
nhs.uk
org.uk
plc.uk
police.uk
*.sch.uk
// au
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
act.au
nsw.au
nt.au
qld.au
sa.au
tas.au
vic.au
wa.au
// jp
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
hokkaido.jp
tokyo.jp
osaka.jp
kyoto.jp
aichi.jp
fukuoka.jp
okinawa.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// nz
ac.nz
co.nz
geek.nz
gen.nz
govt.nz
health.nz
iwi.nz
kiwi.nz
maori.nz
mil.nz
net.nz
org.nz
school.nz
// za
ac.za
co.za
edu.za
gov.za
law.za
mil.za
net.za
nom.za
org.za
school.za
web.za
// br
com.br
net.br
org.br
gov.br
edu.br
mil.br
art.br
adv.br
blog.br
eco.br
ind.br
inf.br
jus.br
tv.br
// in
ac.in
co.in
edu.in
firm.in
gen.in
gov.in
ind.in
mil.in
net.in
nic.in
org.in
res.in
// cn
ac.cn
com.cn
edu.cn
gov.cn
mil.cn
net.cn
org.cn
bj.cn
sh.cn
tj.cn
cq.cn
// kr
ac.kr
co.kr
es.kr
go.kr
hs.kr
kg.kr
mil.kr
ms.kr
ne.kr
or.kr
pe.kr
re.kr
sc.kr
seoul.kr
busan.kr
// mx
com.mx
net.mx
org.mx
edu.mx
gob.mx
// ar
com.ar
edu.ar
gob.ar
int.ar
mil.ar
net.ar
org.ar
tur.ar
// tr
av.tr
bbs.tr
bel.tr
biz.tr
com.tr
dr.tr
edu.tr
gen.tr
gov.tr
info.tr
k12.tr
mil.tr
name.tr
net.tr
org.tr
pol.tr
tel.tr
tv.tr
web.tr
// il
ac.il
co.il
gov.il
idf.il
k12.il
muni.il
net.il
org.il
// id
ac.id
biz.id
co.id
go.id
mil.id
my.id
net.id
or.id
sch.id
web.id
// th
ac.th
co.th
go.th
in.th
mi.th
net.th
or.th
// sg
com.sg
edu.sg
gov.sg
net.sg
org.sg
per.sg
// hk
com.hk
edu.hk
gov.hk
idv.hk
net.hk
org.hk
// tw
club.tw
com.tw
ebiz.tw
edu.tw
game.tw
gov.tw
idv.tw
mil.tw
net.tw
org.tw
// ua
com.ua
edu.ua
gov.ua
in.ua
net.ua
org.ua
kiev.ua
lviv.ua
// pl
com.pl
net.pl
org.pl
edu.pl
info.pl
waw.pl
wroc.pl
krakow.pl
// ca
ab.ca
bc.ca
mb.ca
nb.ca
nf.ca
nl.ca
ns.ca
nt.ca
nu.ca
on.ca
pe.ca
qc.ca
sk.ca
yk.ca
gc.ca
// ru
ac.ru
edu.ru
gov.ru
int.ru
mil.ru
test.ru
// us (states + the k12/cc/lib system, subset)
ca.us
ny.us
tx.us
fl.us
wa.us
ma.us
k12.ca.us
k12.ny.us
k12.ma.us
cc.ca.us
lib.ca.us
// full-wildcard TLDs
*.bd
*.ck
!www.ck
*.er
*.fk
*.jm
*.kh
*.mm
*.np
*.pg
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
githubusercontent.com
gitlab.io
blogspot.com
appspot.com
*.r.appspot.com
herokuapp.com
netlify.app
vercel.app
web.app
firebaseapp.com
pages.dev
workers.dev
cloudfront.net
azurewebsites.net
readthedocs.io
wordpress.com
s3.amazonaws.com
// amazon, multi-level wildcards (per-customer compute hostnames)
*.compute.amazonaws.com
*.compute-1.amazonaws.com
*.elb.amazonaws.com
// centralnic pseudo-cc second-levels
uk.com
us.com
de.com
eu.com
jpn.com
za.com
gb.net
se.net
// ===END PRIVATE DOMAINS===
"""


def parse_psl(text: str = PSL_SNAPSHOT, *, icann_only: bool = False):
    """-> (rules, wildcards, exceptions): each a dict
    {label_count: sorted list of suffix strings}. ``label_count`` for a
    wildcard is the count of its BASE (the part after ``*.``)."""
    rules: dict[int, set] = {}
    wildcards: dict[int, set] = {}
    exceptions: dict[int, set] = {}
    in_private = False
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "BEGIN PRIVATE" in line:
                in_private = True
            continue
        if in_private and icann_only:
            continue
        if line.startswith("!"):
            s = line[1:]
            exceptions.setdefault(s.count(".") + 1, set()).add(s)
        elif line.startswith("*."):
            s = line[2:]
            wildcards.setdefault(s.count(".") + 1, set()).add(s)
        else:
            rules.setdefault(line.count(".") + 1, set()).add(line)
    return (
        {k: sorted(v) for k, v in rules.items()},
        {k: sorted(v) for k, v in wildcards.items()},
        {k: sorted(v) for k, v in exceptions.items()},
    )


# ---------------------------------------------------------- Spark columns


def public_suffix_labels(host: Column, *, icann_only: bool = False) -> Column:
    """int Column: how many trailing labels of ``host`` form its public
    suffix, per the PSL algorithm (exception rules first, then the
    longest match among normal + wildcard rules, default 1)."""
    rules, wildcards, exceptions = parse_psl(icann_only=icann_only)
    n = F.size(F.split(host, r"\."))
    sfx = lambda k: F.substring_index(host, ".", -k)

    out = None
    # exceptions beat everything; a k-label exception rule's public
    # suffix is the rule minus its leftmost label (k-1 labels)
    for k in sorted(exceptions, reverse=True):
        cond = (n >= k) & sfx(k).isin(exceptions[k])
        out = F.when(cond, F.lit(k - 1)) if out is None else out.when(cond, F.lit(k - 1))
    # longest match wins: walk candidate public-suffix sizes downward;
    # size d comes from a d-label normal rule OR a (d-1)-label wildcard
    # base with any extra host label under it
    max_d = max([*rules, *[b + 1 for b in wildcards], 1])
    for d in range(max_d, 0, -1):
        conds = []
        if d in rules:
            conds.append((n >= d) & sfx(d).isin(rules[d]))
        if d - 1 in wildcards:
            conds.append((n >= d) & sfx(d - 1).isin(wildcards[d - 1]))
        if not conds:
            continue
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        out = F.when(cond, F.lit(d)) if out is None else out.when(cond, F.lit(d))
    return out.otherwise(F.lit(1))


def registrable_domain(host_col, *, icann_only: bool = False) -> Column:
    """string Column: the PSL registrable domain (public suffix plus one
    label), NULL when the host IS a public suffix (or shorter). Pure
    scan-side codegen — InSet membership + one dynamic-length
    substring_index via slice on the label array."""
    host = F.lower(host_col if isinstance(host_col, Column) else F.col(host_col))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ps = public_suffix_labels(host, icann_only=icann_only)
    return F.when(n > ps, F.concat_ws(".", F.slice(labels, n - ps, ps + 1)))


# ------------------------------------------------------------ oracle SQL


def _sql_in(values: list[str]) -> str:
    return "(" + ", ".join("'" + v + "'" for v in values) + ")"


def public_suffix_labels_sql(host_expr: str, *, icann_only: bool = False) -> str:
    """DuckDB CASE replaying public_suffix_labels over the same snapshot
    — the independent oracle side. ``host_expr`` must be a lowercased
    host SQL expression."""
    rules, wildcards, exceptions = parse_psl(icann_only=icann_only)
    lab = f"string_split({host_expr}, '.')"
    n = f"len({lab})"
    sfx = lambda k: f"array_to_string({lab}[-{k}:], '.')"
    arms = []
    for k in sorted(exceptions, reverse=True):
        arms.append(
            f"WHEN {n} >= {k} AND {sfx(k)} IN {_sql_in(exceptions[k])} THEN {k - 1}"
        )
    max_d = max([*rules, *[b + 1 for b in wildcards], 1])
    for d in range(max_d, 0, -1):
        conds = []
        if d in rules:
            conds.append(f"({n} >= {d} AND {sfx(d)} IN {_sql_in(rules[d])})")
        if d - 1 in wildcards:
            conds.append(f"({n} >= {d} AND {sfx(d - 1)} IN {_sql_in(wildcards[d - 1])})")
        if conds:
            arms.append(f"WHEN {' OR '.join(conds)} THEN {d}")
    return "CASE " + " ".join(arms) + " ELSE 1 END"


def registrable_domain_sql(host_expr: str, *, icann_only: bool = False) -> str:
    """DuckDB expression for the registrable domain of ``host_expr``."""
    lab = f"string_split({host_expr}, '.')"
    n = f"len({lab})"
    ps = public_suffix_labels_sql(host_expr, icann_only=icann_only)
    return (
        f"CASE WHEN {n} > ({ps}) "
        f"THEN array_to_string({lab}[{n} - ({ps}):], '.') "
        f"ELSE NULL END"
    )
