"""Deterministic synthetic `web_pages` corpus + `alias_dict` generator.

Implements FIXTURES.md §1/§2: every value is a pure function of
``(seed, row)`` — no wall clock, no unseeded random — so the corpus is
byte-identical across processes and parallelism levels, which is what makes
the row-invariant and two-parallelism-level equivalence checks meaningful.

Planted structure:
- a fixed entity inventory (people / orgs / places) with surface variants;
  some variants are deliberately *absent* from the alias dict so
  MinHash-LSH canonicalization has real work;
- facts in the exact sentence shapes functions/triples.py recognizes;
- a skewed head: a few entities own ~20% of planted mentions
  (SURVEY.md §4.3 head-entity skew — salting must be exercised);
- an alias collision ("Mercury" → org and place) for link-prior tests;
- edge rows (every 997): empty html, non-UTF8 bytes, boilerplate-only,
  duplicate html under a second url, duplicate url (last-warc_ts-wins).

Corpus generation itself runs as a Ray Data pipeline
(``range(n) → map_batches(gen) → write_parquet``) so bench-scale corpora
(50k+ pages) are produced in parallel and cached under /tmp.
"""

from __future__ import annotations

import datetime
import functools
import os
import random
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_embedding, stable_u32
from ..functions.html_extract import extract_text

EPOCH = datetime.datetime(2025, 1, 1, 0, 0, 0)
_EDGE_MOD = 997

_FIRST = ["Alice", "Boris", "Clara", "Dmitri", "Elena", "Farid", "Grace", "Hugo",
          "Ingrid", "Jonas", "Kara", "Liam", "Mona", "Nils", "Oskar", "Priya",
          "Quentin", "Rosa", "Stefan", "Tara"]
_LAST = ["Turner", "Vargas", "Weiss", "Novak", "Yamada", "Zhou", "Abbott",
         "Berger", "Castro", "Duval", "Ekman", "Fischer", "Grant", "Holm",
         "Ito", "Jensen", "Koch", "Lindt", "Moreau", "Okafor"]
_ORG_A = ["Blue", "Crimson", "Silver", "Quantum", "Solar", "Nordic", "Atlas",
          "Vertex", "Cobalt", "Lumen", "Orion", "Vega", "Zenith", "Halcyon",
          "Ember", "Falcon", "Granite", "Iris", "Juniper", "Krypton"]
_ORG_B = ["River", "Peak", "Forge", "Works", "Data", "Grid", "Wave", "Field",
          "Core", "Path", "Loop", "Spark", "Harbor", "Summit", "Circuit"]
_ORG_SUFFIX = [("Labs", "Laboratories"), ("Corp", "Corporation"),
               ("Systems", "Holdings"), ("Group", "Partners")]
_CITIES = ["Arlowe", "Bexfield", "Corvan", "Drayton", "Elmsworth", "Farrow",
           "Glenholt", "Harwick", "Isleton", "Jorvik", "Kestrel", "Larkspur",
           "Midvale", "Norcliff", "Oakmere", "Pellworth", "Quarrytown",
           "Rivermoor", "Stonegate", "Thornbury"]

_FILLERS = [
    "The weather stayed mild through most of the quarter.",
    "Markets remained calm despite earlier warnings.",
    "Several readers wrote in with questions about the schedule.",
    "More details will follow in an upcoming report.",
    "The panel discussed a wide range of unrelated topics.",
    "Nothing else of note happened during the visit.",
    "Attendance at the annual fair was higher than expected.",
    "Local volunteers repaired the old footbridge over the weekend.",
    "A brief rain shower interrupted the afternoon session.",
    "The committee postponed its decision until next month.",
    "Nobody founded anything during the recess.",
    "Analysts who works for nobody were not consulted.",
]

_FILLERS_BY_LANG = {
    "de": [
        "Das Wetter ist in der Region mit der Zeit deutlich milder geworden.",
        "Die Sitzung wurde auf ein späteres Datum verschoben und vertagt.",
        "Mehrere Leser haben Fragen zu dem neuen Zeitplan eingereicht.",
        "Weitere Einzelheiten folgen in einem kommenden Bericht für alle.",
        "Der Ausschuss hat die Entscheidung auf den nächsten Monat verschoben.",
        "Ein kurzer Regenschauer unterbrach die Veranstaltung am Nachmittag.",
    ],
    "fr": [
        "La réunion a été reportée pour la semaine prochaine dans la salle.",
        "Plusieurs lecteurs ont envoyé des questions sur le programme.",
        "Les détails suivront dans un prochain rapport pour le public.",
        "Le comité a repoussé sa décision au mois prochain sans un vote.",
        "Une brève averse a interrompu la séance dans un après-midi calme.",
        "Le temps est resté doux pendant la plus grande partie du trimestre.",
    ],
}

_PAD = ("Additional background material and archived notes are collected here "
        "for completeness and easy reference by returning visitors. ")
_PAD_BY_LANG = {
    "de": ("Zusätzliches Hintergrundmaterial und archivierte Notizen sind hier "
           "für wiederkehrende Besucher mit der Zeit gesammelt worden. "),
    "fr": ("Des documents de fond et des notes archivées sont rassemblés ici "
           "pour les visiteurs avec une référence facile et complète. "),
}


@dataclass(frozen=True)
class Entity:
    qid: str
    etype: str  # person | org | place
    canonical: str
    variants: tuple[str, ...]       # all surfaces (variants[0] == canonical)
    dict_variants: tuple[str, ...]  # subset present in the alias dict


@functools.lru_cache(maxsize=4)
def build_entities(seed: int = 42) -> list[Entity]:
    """Fixed entity inventory; pure function of the seed."""
    rng = random.Random(seed * 7919 + 1)
    ents: list[Entity] = []
    qn = 0

    for i in range(40):  # people
        name = f"{_FIRST[i % 20]} {_LAST[(i * 7 + i // 20) % 20]}"
        first, last = name.split(" ")
        mid = chr(ord("A") + (i * 5) % 26)
        variants = (name, f"{first} {mid} {last}")
        # all person variants are dict-resolvable (person surfaces that share
        # a surname sit below the LSH jaccard threshold by design, so the
        # dict — not LSH — is what links them)
        dict_variants = variants
        ents.append(Entity(f"Q{qn}", "person", name, variants, dict_variants))
        qn += 1

    for i in range(50):  # orgs
        a = _ORG_A[i % 20]
        b = _ORG_B[(i * 3 + i // 20) % 15]
        sfx, sfx_long = _ORG_SUFFIX[i % 4]
        canonical = f"{a} {b} {sfx}"
        variants = (canonical, f"{a} {b} {sfx_long}", f"{a}{b} {sfx_long}")
        # the fused-token variant is never in the dict → LSH must cluster it
        dict_variants = (canonical, f"{a} {b} {sfx_long}")
        ents.append(Entity(f"Q{qn}", "org", canonical, variants, dict_variants))
        qn += 1

    for i in range(30):  # places
        c = _CITIES[i % 20] if i < 20 else f"{_CITIES[i % 20]} Heights"
        # no " City" variant for the "... Heights" places — two distinct
        # "<X> Heights City" surfaces would collide above the LSH threshold
        variants = (c, f"{c} City") if (i % 3 and i < 20) else (c,)
        ents.append(Entity(f"Q{qn}", "place", c, variants, variants))
        qn += 1

    # alias collision: one org and one place both answer to "Mercury"
    ents.append(Entity(f"Q{qn}", "org", "Mercury Dynamics",
                       ("Mercury Dynamics", "Mercury"), ("Mercury Dynamics", "Mercury")))
    qn += 1
    ents.append(Entity(f"Q{qn}", "place", "Mercury",
                       ("Mercury",), ("Mercury",)))
    qn += 1
    rng.shuffle  # (rng reserved for future inventory growth; keep signature stable)
    return ents


@functools.lru_cache(maxsize=4)
def _by_type(seed: int) -> dict[str, list[Entity]]:
    ents = build_entities(seed)
    out: dict[str, list[Entity]] = {"person": [], "org": [], "place": []}
    for e in ents:
        out[e.etype].append(e)
    return out


def head_entities(seed: int = 42) -> list[Entity]:
    """The deliberately skewed heads (~20% of planted mentions)."""
    t = _by_type(seed)
    return [t["org"][0], t["org"][1], t["place"][0]]


# (subject type, object type) → allowed predicate phrases
_PRED_BY_TYPES: dict[tuple[str, str], list[str]] = {
    ("person", "org"): ["works for", "founded", "is the CEO of", "invested in"],
    ("org", "org"): ["acquired", "partnered with", "invested in", "produces"],
    ("org", "place"): ["is located in", "is based in"],
    ("person", "place"): ["was born in"],
    ("place", "place"): ["is the capital of"],
}
_TYPE_PAIRS = list(_PRED_BY_TYPES)


def _pick_variant(rng: random.Random, e: Entity) -> str:
    return e.variants[rng.randrange(len(e.variants))]


def make_fact_sentence(rng: random.Random, seed: int) -> tuple[str, tuple[str, str, str]]:
    """One planted fact sentence; returns (sentence, (subj_qid, pred_id, obj_qid))."""
    from ..functions.triples import PREDICATES

    phrase_to_pred = {v: k for k, v in PREDICATES.items()}
    t = _by_type(seed)
    heads = head_entities(seed)
    st, ot = _TYPE_PAIRS[rng.randrange(len(_TYPE_PAIRS))]
    subj = t[st][rng.randrange(len(t[st]))]
    # head skew: ~20% of facts use a head entity as subject (type permitting)
    if rng.random() < 0.20:
        cand = [h for h in heads if h.etype == st]
        if cand:
            subj = cand[rng.randrange(len(cand))]
    obj = t[ot][rng.randrange(len(t[ot]))]
    while obj.qid == subj.qid:
        obj = t[ot][rng.randrange(len(t[ot]))]
    phrase = _PRED_BY_TYPES[(st, ot)][rng.randrange(len(_PRED_BY_TYPES[(st, ot)]))]
    suffix = f" in {1990 + rng.randrange(36)}" if rng.random() < 0.3 else ""
    sent = f"{_pick_variant(rng, subj)} {phrase} {_pick_variant(rng, obj)}{suffix}."
    return sent, (subj.qid, phrase_to_pred[phrase], obj.qid)


def url_for(seed: int, row: int) -> str:
    return f"https://site{row % 211}.example/{stable_u32(str(row), seed)}/page-{row}"


def warc_ts_for(row: int) -> datetime.datetime:
    return EPOCH + datetime.timedelta(seconds=row * 9173)


def _core_page(seed: int, row: int) -> tuple[bytes, str, list[tuple[str, str, str]]]:
    """(html, lang, planted_facts) for a normal (non-edge) row. Pure."""
    rng = random.Random((seed << 20) ^ (row * 2654435761 % (1 << 61)))
    r = rng.random()
    lang = "en" if r < 0.9 else ("de" if r < 0.94 else ("fr" if r < 0.98 else ""))
    n_sents = rng.randint(3, 40)
    heavy = rng.random() < 0.01  # long tail: 1% of rows ~10× larger
    if heavy:
        n_sents *= 10
    sents: list[str] = []
    facts: list[tuple[str, str, str]] = []
    fillers = _FILLERS_BY_LANG.get(lang, _FILLERS)  # non-en pages read in-language
    for _ in range(n_sents):
        if lang == "en" and rng.random() < 0.6:
            s, f = make_fact_sentence(rng, seed)
            sents.append(s)
            facts.append(f)
        else:
            sents.append(fillers[rng.randrange(len(fillers))])
    title = f"Notes from site {row % 211} page {row}"
    paras: list[str] = []
    i = 0
    while i < len(sents):
        k = min(len(sents) - i, rng.randint(1, 5))
        paras.append("<p>" + " ".join(sents[i : i + k]) + "</p>")
        i += k
    n_pad = rng.randint(0, 20) * (10 if heavy else 1)
    pad = _PAD_BY_LANG.get(lang, _PAD)
    for _ in range(n_pad):
        paras.append("<p>" + pad * rng.randint(1, 4) + "</p>")
    html = (
        "<html><head><title>" + title + "</title>"
        "<style>body{font:14px sans;}nav{color:#333}</style></head>"
        "<body><nav><ul><li><a href='/'>Home</a></li><li><a href='/about'>About"
        "</a></li><li><a href='/archive'>Archive</a></li></ul></nav>"
        "<header><h2>Site banner</h2></header>"
        "<div class='content'><h1>" + title + "</h1>" + "".join(paras) + "</div>"
        "<aside>Sponsored: amazing deals on widgets, click now!</aside>"
        "<footer>&copy; 2025 example network &middot; " + _outlinks_html(seed, row)
        + "contact &middot; privacy"
        "</footer><script>var t=Date.now();track(t);</script></body></html>"
    )
    return html.encode("utf-8"), lang, facts


# a few hub sites own a disproportionate share of in-links (web-graph
# power-law head — the skew axis the host-level aggregation must survive)
_HUB_SITES = (7, 48, 89, 130, 171)


def _outlinks_html(seed: int, row: int) -> str:
    """Deterministic cross-site outlinks planted in the footer (boilerplate
    zone: functions/html_extract.py SKIP_TAGS drops <footer>, so the
    extracted text — and every KG golden derived from it — is unchanged by
    these). Separate rng stream so the existing content draws stay
    byte-identical too."""
    lrng = random.Random((seed << 22) ^ (row * 7877 + 11))
    n_out = lrng.randint(0, 6)
    parts = []
    for _ in range(n_out):
        t = _HUB_SITES[lrng.randrange(5)] if lrng.random() < 0.35 else lrng.randrange(211)
        parts.append(f"<a href='https://site{t}.example/ref-{lrng.randrange(1000)}'>site {t}</a> ")
    return "".join(parts)


def gen_page(seed: int, row: int) -> dict:
    """One web_pages row (plus planted facts for oracle use). Pure.

    Edge rows (FIXTURES.md §1): row%997 == 0 empty html, 1 non-UTF8,
    2 boilerplate-only, 3 duplicate html of row+2 (a normal row) under this
    row's own url, 4 duplicate url of row+1 (the later-warc_ts row+1 wins).
    """
    m = row % _EDGE_MOD
    url = url_for(seed, row)
    facts: list[tuple[str, str, str]] = []
    lang = "en"
    if m == 0:
        html = b""
    elif m == 1:
        html = b"\xff\xfe\x00<p>Broken Bytes Remain</p>\x80\x81"
    elif m == 2:
        html = (
            b"<html><head><title>x</title></head><body><nav>Home About</nav>"
            b"<footer>footer only</footer><script>x()</script></body></html>"
        )
    elif m == 3:
        html, lang, facts = _core_page(seed, row + 2)  # same html as row+2, different url
    elif m == 4:
        html, lang, facts = _core_page(seed, row)
        url = url_for(seed, row + 1)  # duplicate url; row+1 has the later warc_ts and wins
    else:
        html, lang, facts = _core_page(seed, row)
    rng = random.Random((seed << 21) ^ row)
    text = extract_text(html) if rng.random() < 0.2 else None
    return {
        "url": url,
        "warc_ts": warc_ts_for(row),
        "html": html,
        "text": text,
        "lang": lang,
        "_facts": facts,
    }


WEB_PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def pages_table(seed: int, rows: list[int]) -> pa.Table:
    """Arrow table of web_pages rows for the given row indices (no _facts)."""
    recs = [gen_page(seed, r) for r in rows]
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in recs],
            "warc_ts": [r["warc_ts"] for r in recs],
            "html": [r["html"] for r in recs],
            "text": [r["text"] for r in recs],
            "lang": [r["lang"] for r in recs],
        },
        schema=WEB_PAGES_SCHEMA,
    )


class _GenBatch:
    """Actor-pool batch generator (entity inventory built once per actor)."""

    def __init__(self, seed: int):
        self.seed = seed
        build_entities(seed)  # warm the cache once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_pylist()
        return pages_table(self.seed, rows)


def alias_dict_table(seed: int = 42, dim: int = 64) -> pa.Table:
    """The entity-linking side input (FIXTURES.md §2): one row per
    (dict surface, qid); priors seeded; embeddings = hash embedding of the
    entity's *canonical* name (so variant mentions score < 1 against it)."""
    ents = build_entities(seed)
    rng = random.Random(seed * 31 + 7)
    surfaces, qids, priors, embs = [], [], [], []
    for e in ents:
        for s in e.dict_variants:
            surfaces.append(s)
            qids.append(e.qid)
            # collision resolution: org "Mercury Dynamics" gets the higher
            # prior for surface "Mercury" than place "Mercury"
            base = 0.9 if s == e.canonical else 0.6
            priors.append(round(base * (0.8 + 0.2 * rng.random()), 6))
            embs.append(hash_embedding(e.canonical, dim))
    emb_type = pa.list_(pa.float32(), dim)
    return pa.Table.from_arrays(
        [
            pa.array(surfaces, pa.string()),
            pa.array(qids, pa.string()),
            pa.array(np.array(priors, dtype=np.float32), pa.float32()),
            pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(embs).astype(np.float32)), dim
            ).cast(emb_type),
        ],
        names=["surface", "qid", "prior", "embedding"],
    )


def write_corpus(out_dir: str, n_rows: int, seed: int = 42, dim: int = 64,
                 rows_per_block: int = 250) -> str:
    """Generate web_pages + alias_dict parquet under ``out_dir`` via a Ray
    Data pipeline (parallel generation; no driver-side row loop)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    pages_dir = os.path.join(out_dir, "web_pages")
    os.makedirs(pages_dir, exist_ok=True)
    n_blocks = max(1, n_rows // rows_per_block)
    ds = rd.range(n_rows, override_num_blocks=n_blocks)
    import ray

    gen_pool = max(1, min(8, int(ray.cluster_resources().get("CPU", 4)) - 1))
    ds = ds.map_batches(_GenBatch, fn_constructor_kwargs={"seed": seed},
                        batch_format="pyarrow", batch_size=rows_per_block,
                        concurrency=gen_pool)
    ds.write_parquet(pages_dir)
    pq.write_table(alias_dict_table(seed, dim), os.path.join(out_dir, "alias_dict.parquet"))
    return out_dir


GEN_VERSION = 3  # bump when generated content changes, to invalidate caches


def corpus_path(n_rows: int, seed: int = 42, dim: int = 64,
                base: str = "/tmp/raykg_corpus") -> str:
    """Deterministic cache dir for ``ensure_corpus`` WITHOUT generating —
    lets oracle SQL strings embed the path before the corpus exists."""
    return os.path.join(base, f"n{n_rows}_s{seed}_d{dim}_v{GEN_VERSION}")


def ensure_corpus(n_rows: int, seed: int = 42, dim: int = 64,
                  base: str = "/tmp/raykg_corpus") -> str:
    """Cached corpus dir keyed by (n_rows, seed, generator version);
    generated once, concurrency-safe (advisory lock)."""
    from ..state.manifest import dir_lock

    out = corpus_path(n_rows, seed, dim, base)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    with dir_lock(base, f".lock_n{n_rows}_s{seed}"):
        if os.path.exists(marker):  # another process generated it meanwhile
            return out
        write_corpus(out, n_rows, seed, dim)
        with open(marker, "w") as f:
            f.write("ok")
    return out
