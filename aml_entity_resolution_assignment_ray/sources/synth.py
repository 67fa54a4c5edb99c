"""Deterministic synthetic transcript corpus with ground-truth entities.

Transposes the reference's messy-client-record generator
(reference generation.py) onto the rebuild's input shape
(``BASELINE.json input_hint``): one Parquet table of multi-turn
conversation transcripts ``(conv_id, turn_idx, role, text, tool, ts)``
plus a ground-truth table ``(conv_id, entity_id)``.

Reproduced noise semantics (same probabilities as the reference):

* ground truth with 5% doppelgangers — same name+dob, different
  ids/contacts (generation.py:153-166);
* per entity 1 golden + ``randint(0, dup_multiplier)`` noisy
  conversations (generation.py:240);
* name-initial 30% / typo noise (generation.py:252-258), date-format
  noise (:36-51), address nulls + abbreviation noise (:263-267), hard/soft
  national-id, phone and email noise with nulls (:271-297), 2% wrong
  country (:299-301);
* string noise = typo / swap / delete / insert (:53-76).

Entity fields are carried *inside turn text* using fixed templates; the
extraction stage recovers them with compiled regexes.  Everything is
seeded (``random.Random(seed)``, reference generation.py:12 seed 42).
"""

from __future__ import annotations

import random
import string
import uuid
from datetime import date, datetime, timedelta

import pyarrow as pa

COUNTRIES = ["PL", "US", "ES", "DE"]

# Name/street pools approximate Faker's diversity (the reference's fakers,
# generation.py:17-24, draw from ~10^3-name locale pools; collisions of
# full name AND street must stay rare or Rules 3/4 produce spurious
# matches the reference's published metrics don't show).  Surnames are
# composed stem x suffix per locale morphology -> hundreds of distinct
# values per country; streets are word x type products.

_FIRST = {
    "PL": ["Marek", "Łukasz", "Agnieszka", "Paweł", "Katarzyna", "Józef", "Zofia",
           "Krzysztof", "Małgorzata", "Tomasz", "Anna", "Piotr", "Ewa", "Stanisław",
           "Andrzej", "Barbara", "Jan", "Maria", "Tadeusz", "Danuta", "Marcin",
           "Elżbieta", "Michał", "Teresa", "Grzegorz", "Halina", "Jerzy", "Janina",
           "Adam", "Irena", "Wojciech", "Magdalena", "Rafał", "Joanna", "Maciej",
           "Monika", "Dariusz", "Beata", "Jacek", "Dorota"],
    "US": ["James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
           "Linda", "David", "Elizabeth", "William", "Barbara", "Richard", "Susan",
           "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen", "Christopher",
           "Nancy", "Daniel", "Lisa", "Matthew", "Betty", "Anthony", "Margaret",
           "Mark", "Sandra", "Donald", "Ashley", "Steven", "Kimberly", "Paul",
           "Emily", "Andrew", "Donna", "Joshua", "Michelle"],
    "ES": ["José", "María", "Antonio", "Carmen", "Manuel", "Ana", "Francisco",
           "Isabel", "Juan", "Dolores", "Javier", "Pilar", "Miguel", "Teresa",
           "Rafael", "Rosa", "Pedro", "Lucía", "Ángel", "Mercedes", "Alejandro",
           "Elena", "Fernando", "Cristina", "Sergio", "Paula", "Pablo", "Laura",
           "Jorge", "Marta", "Alberto", "Silvia", "Luis", "Sara", "Álvaro",
           "Patricia", "Adrián", "Andrea", "Diego", "Raquel"],
    "DE": ["Hans", "Ursula", "Jürgen", "Helga", "Klaus", "Ingrid", "Wolfgang",
           "Renate", "Günter", "Monika", "Dieter", "Gisela", "Horst", "Sabine",
           "Werner", "Christa", "Heinz", "Erika", "Gerhard", "Elke", "Manfred",
           "Petra", "Uwe", "Andrea", "Peter", "Birgit", "Rainer", "Karin",
           "Bernd", "Brigitte", "Thomas", "Heike", "Frank", "Susanne", "Stefan",
           "Gabriele", "Andreas", "Martina", "Markus", "Claudia"],
}
_LAST_STEM = {
    "PL": ["Kowal", "Nowak", "Wiśniew", "Wójc", "Kamiń", "Lewandow", "Zieliń",
           "Szymań", "Woźnia", "Dąbrow", "Kozłow", "Jankow", "Mazur", "Kwiatkow",
           "Krawcz", "Piotrow", "Grabow", "Zając", "Pawłow", "Michalsk", "Król",
           "Wieczor", "Jabłoń", "Majew", "Olszew", "Stępień", "Malinow", "Jaworsk",
           "Adamcz", "Dudek", "Nowick", "Pawlak", "Górsk", "Witkow", "Walczak",
           "Sikora", "Baran", "Rutkow", "Szewcz", "Ostrow"],
    "US": ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
           "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Wilson",
           "Anderson", "Taylor", "Moore", "Jackson", "Martin", "Lee", "Thompson",
           "White", "Harris", "Clark", "Lewis", "Robinson", "Walker", "Young",
           "Allen", "King", "Wright", "Scott", "Green", "Baker", "Adams",
           "Nelson", "Hill", "Campbell", "Mitchell", "Carter", "Roberts"],
    "ES": ["García", "Fernández", "González", "Rodríguez", "López", "Martínez",
           "Sánchez", "Pérez", "Gómez", "Martín", "Jiménez", "Ruiz", "Díaz",
           "Hernández", "Moreno", "Muñoz", "Álvarez", "Romero", "Alonso",
           "Gutiérrez", "Navarro", "Torres", "Domínguez", "Vázquez", "Ramos",
           "Gil", "Ramírez", "Serrano", "Blanco", "Molina", "Morales", "Suárez",
           "Ortega", "Delgado", "Castro", "Ortiz", "Rubio", "Marín", "Sanz", "Iglesias"],
    "DE": ["Müller", "Schmidt", "Schneider", "Fischer", "Weber", "Meyer", "Wagner",
           "Becker", "Schulz", "Hoffmann", "Schäfer", "Koch", "Bauer", "Richter",
           "Klein", "Wolf", "Schröder", "Neumann", "Schwarz", "Zimmermann",
           "Braun", "Krüger", "Hofmann", "Hartmann", "Lange", "Schmitt", "Werner",
           "Schmitz", "Krause", "Meier", "Lehmann", "Schmid", "Schulze", "Maier",
           "Köhler", "Herrmann", "König", "Walter", "Mayer", "Huber"],
}
_LAST_SUFFIX = {
    # PL stems compose with endings (Kowal->Kowalski/Kowalczyk); other
    # locales use the surname list directly, with occasional doubling
    # handled in generate_entities.
    "PL": ["ski", "czyk", "iak", "ik"],
    "US": [""],
    "ES": [""],
    "DE": [""],
}
_STREET_WORD = {
    "PL": ["Polna", "Leśna", "Słoneczna", "Krótka", "Szkolna", "Ogrodowa",
           "Lipowa", "Brzozowa", "Łąkowa", "Kwiatowa", "Sosnowa", "Klonowa",
           "Parkowa", "Zielona", "Akacjowa", "Spacerowa", "Sportowa", "Dębowa",
           "Topolowa", "Wiśniowa", "Różana", "Miodowa", "Cicha", "Długa"],
    "US": ["Oak", "Maple", "Cedar", "Sunset", "Elm", "Park", "Pine", "Lake",
           "Hill", "Washington", "Lincoln", "Jefferson", "Madison", "Jackson",
           "Franklin", "Highland", "Forest", "River", "Spring", "Church",
           "Main", "Mill", "Walnut", "Chestnut"],
    "ES": ["Mayor", "Sol", "España", "Gracia", "Real", "Nueva", "Luna",
           "Rosario", "Carmen", "Victoria", "Libertad", "Constitución",
           "Esperanza", "Alegría", "Castilla", "Aragón", "Colón", "Goya",
           "Cervantes", "Velázquez", "Murillo", "Serrano", "Alcalá", "Toledo"],
    "DE": ["Haupt", "Bahnhof", "Garten", "Schiller", "Goethe", "Mozart",
           "Beethoven", "Linden", "Birken", "Eichen", "Buchen", "Tannen",
           "Berg", "Tal", "Wald", "Wiesen", "Feld", "Ring", "Markt", "Kirch",
           "Schul", "Post", "Mühlen", "Rosen"],
}
_STREET_TYPE = {
    "PL": ["ulica", "aleja", "osiedle"],
    "US": ["Street", "Avenue", "Road", "Boulevard", "Drive", "Lane"],
    "ES": ["Calle", "Avenida", "Plaza", "Paseo"],
    "DE": ["straße", "weg", "platz", "allee", "gasse"],
}
_CITIES = {
    "PL": ["Warszawa", "Kraków", "Łódź", "Wrocław", "Poznań", "Gdańsk",
           "Szczecin", "Bydgoszcz", "Lublin", "Katowice", "Białystok", "Gdynia"],
    "US": ["Springfield", "Riverside", "Franklin", "Clinton", "Greenville",
           "Fairview", "Salem", "Madison", "Georgetown", "Arlington",
           "Ashland", "Dover"],
    "ES": ["Madrid", "Barcelona", "Sevilla", "Valencia", "Málaga", "Zaragoza",
           "Murcia", "Palma", "Bilbao", "Alicante", "Córdoba", "Valladolid"],
    "DE": ["Berlin", "München", "Köln", "Hamburg", "Frankfurt", "Stuttgart",
           "Düsseldorf", "Dortmund", "Essen", "Leipzig", "Bremen", "Dresden"],
}
_EMAIL_DOMAINS = {
    "PL": ["wp.pl", "onet.pl", "interia.pl"],
    "US": ["example.com", "mailbox.us", "fastmail.us"],
    "ES": ["correo.es", "mail.es"],
    "DE": ["web.de", "gmx.de", "mail.de"],
}
_GLOBAL_DOMAINS = ["gmail.com", "yahoo.com", "hotmail.com", "outlook.com"]


def _ascii_simple(s: str) -> str:
    from ..functions.textnorm import ascii_fold
    return ascii_fold(s)


class _Gen:
    def __init__(self, seed: int):
        self.rng = random.Random(seed)

    # --- noise injectors, mirroring generation.py ---

    def date_noise(self, d: date):
        """generation.py:36-51 — mixed formats, 5% null."""
        r = self.rng.random()
        if r < 0.6:
            return d.strftime("%Y-%m-%d")
        if r < 0.75:
            return d.strftime("%d/%m/%Y")
        if r < 0.85:
            return d.strftime("%m-%d-%Y")
        if r < 0.95:
            return d.strftime("%Y/%m/%d")
        return None

    def string_noise(self, text, probability=0.3):
        """generation.py:53-76 — typo/swap/delete/insert."""
        if text is None or self.rng.random() > probability:
            return text
        chars = list(text)
        noise_type = self.rng.choice(["typo", "swap", "delete", "insert"])
        if len(chars) < 2:
            return "".join(chars)
        idx = self.rng.randint(0, len(chars) - 1)
        if noise_type == "typo":
            chars[idx] = self.rng.choice(string.ascii_letters)
        elif noise_type == "swap" and idx < len(chars) - 1:
            chars[idx], chars[idx + 1] = chars[idx + 1], chars[idx]
        elif noise_type == "delete":
            del chars[idx]
        elif noise_type == "insert":
            chars.insert(idx, self.rng.choice(string.ascii_letters))
        return "".join(chars)

    _ABBR = {
        "Street": "St.", "St": "Street", "Avenue": "Ave.", "Ave": "Avenue",
        "Road": "Rd.", "Rd": "Road", "Boulevard": "Blvd.", "Blvd": "Boulevard",
        "Drive": "Dr.", "Dr": "Drive", "Lane": "Ln.", "Ln": "Lane",
        "ulica": "ul.", "ul": "ulica", "aleja": "al.", "al": "aleja",
        "osiedle": "os.", "os": "osiedle",
        "Calle": "C/", "C/": "Calle", "Avenida": "Av.", "Av": "Avenida",
        "Plaza": "Pza.", "Pza": "Plaza", "Paseo": "Pso.", "Pso": "Paseo",
        "Straße": "Str.", "Str": "Straße", "Platz": "Pl.", "Pl": "Platz",
    }

    def address_noise(self, address, probability=0.4):
        """generation.py:78-127 — abbreviation swaps + occasional typo."""
        if address is None or self.rng.random() > probability:
            return address
        words = address.split()
        new_words = []
        for word in words:
            clean = word.rstrip(".,")
            if clean in self._ABBR and self.rng.random() > 0.5:
                new_words.append(self._ABBR[clean])
            else:
                new_words.append(word)
        result = " ".join(new_words)
        if self.rng.random() > 0.7:
            result = self.string_noise(result, probability=1.0)
        return result

    # --- field generators ---

    def make_nid(self, country: str) -> str:
        r = self.rng
        if country == "US":
            return f"{r.randint(100, 899)}-{r.randint(10, 99)}-{r.randint(1000, 9999)}"
        if country == "PL":
            return "".join(r.choice(string.digits) for _ in range(11))
        if country == "ES":
            return f"{r.randint(10000000, 99999999)}{r.choice(string.ascii_uppercase)}"
        return (f"{r.randint(10, 99)} {r.randint(100000, 999999)} "
                f"{r.choice(string.ascii_uppercase)} {r.randint(100, 999)}")

    def alternate_nid(self, country: str) -> str:
        """generation.py:129-146 — passport-style or fresh standard id."""
        if self.rng.random() < 0.3:
            return ("".join(self.rng.choice(string.ascii_uppercase) for _ in range(2))
                    + "".join(self.rng.choice(string.digits) for _ in range(7)))
        return self.make_nid(country)

    def make_phone(self, country: str) -> str:
        r = self.rng
        if country == "PL":
            n = f"{r.randint(500, 799)} {r.randint(100, 999)} {r.randint(100, 999)}"
            return r.choice([f"+48 {n}", f"0048 {n}", n])
        if country == "US":
            n = f"({r.randint(200, 989)}) {r.randint(200, 999)}-{r.randint(1000, 9999)}"
            return r.choice([f"+1 {n}", n])
        if country == "ES":
            n = f"{r.randint(600, 749)} {r.randint(100, 999)} {r.randint(100, 999)}"
            return r.choice([f"+34 {n}", n])
        n = f"{r.randint(1511, 1799)} {r.randint(1000000, 9999999)}"
        return r.choice([f"+49 {n}", f"0049 {n}", f"0{n}"])

    def make_email(self, first: str, last: str, country: str) -> str:
        r = self.rng
        f = _ascii_simple(first.split(" ")[0].lower())
        l = _ascii_simple(last.split(" ")[-1].lower())
        if r.random() < 0.7:
            dom = r.choice(_EMAIL_DOMAINS[country])
            return f"{f}{r.randint(1, 99)}@{dom}"
        return f"{f}.{l}@{r.choice(_GLOBAL_DOMAINS)}"

    def make_last_name(self, country: str) -> str:
        if country == "PL":
            return self.rng.choice(_LAST_STEM["PL"]) + self.rng.choice(_LAST_SUFFIX["PL"])
        return self.rng.choice(_LAST_STEM[country])

    def make_street(self, country: str) -> str:
        word = self.rng.choice(_STREET_WORD[country])
        typ = self.rng.choice(_STREET_TYPE[country])
        if country == "PL":
            return f"{typ} {word}"          # "ulica Polna"
        if country == "ES":
            return f"{typ} {word}"          # "Calle Mayor"
        if country == "DE":
            return f"{word}{typ}"           # "Lindenstraße"
        return f"{word} {typ}"              # "Oak Street"

    def make_address(self, country: str) -> str:
        num = self.rng.randint(1, 199)
        street = self.make_street(country)
        if country in ("US",):
            return f"{num} {street}"
        return f"{street} {num}"

    def make_dob(self) -> date:
        y = self.rng.randint(1945, 2007)
        m = self.rng.randint(1, 12)
        d = self.rng.randint(1, 28)
        return date(y, m, d)

    def make_uuid(self) -> str:
        return str(uuid.UUID(int=self.rng.getrandbits(128), version=4))


def generate_entities(gen: _Gen, n_entities: int, doppelganger_rate: float = 0.05):
    """Ground-truth entities; 5% doppelgangers share name+dob
    (generation.py:149-166)."""
    entities = []
    for _ in range(n_entities):
        r = gen.rng
        if len(entities) > 100 and r.random() < doppelganger_rate:
            base = r.choice(entities)
            country = base["country"]
            first, last, dob = base["first_name"], base["last_name"], base["dob"]
        else:
            country = r.choice(COUNTRIES)
            first = r.choice(_FIRST[country])
            last = gen.make_last_name(country)
            if country == "ES" and r.random() < 0.5:
                last = f"{last} {gen.make_last_name(country)}"
            dob = gen.make_dob()
        entities.append({
            "entity_id": gen.make_uuid(),
            "first_name": first,
            "last_name": last,
            "dob": dob,
            "country": country,
            "email": gen.make_email(first, last, country),
            "national_id": gen.make_nid(country),
            "phone_number": gen.make_phone(country),
            "address": gen.make_address(country),
            "city": r.choice(_CITIES[country]),
        })
    return entities


def _noisy_record(gen: _Gen, entity: dict) -> dict:
    """One messy observation of an entity (generation.py:242-303)."""
    r = gen.rng
    rec = dict(entity)
    if r.random() > 0.7:
        rec["first_name"] = rec["first_name"][0] + "."
    else:
        rec["first_name"] = gen.string_noise(rec["first_name"], 0.2)
        rec["last_name"] = gen.string_noise(rec["last_name"], 0.2)
    rec["dob"] = gen.date_noise(rec["dob"])
    if r.random() > 0.95:
        rec["address"] = None
    else:
        rec["address"] = gen.address_noise(rec["address"])
    rec["city"] = gen.string_noise(rec["city"], 0.1)

    rand_id = r.random()
    if rand_id > 0.9:
        rec["national_id"] = None
    elif rand_id > 0.8:
        rec["national_id"] = gen.alternate_nid(rec["country"])
    else:
        rec["national_id"] = gen.string_noise(rec["national_id"], 0.1)

    rand_phone = r.random()
    if rand_phone > 0.85:
        rec["phone_number"] = None
    elif rand_phone > 0.75:
        rec["phone_number"] = gen.make_phone(rec["country"])
    else:
        rec["phone_number"] = gen.string_noise(rec["phone_number"], 0.1)

    rand_email = r.random()
    if rand_email > 0.8:
        rec["email"] = None
    elif rand_email > 0.7:
        rec["email"] = gen.make_email(rec["first_name"], rec["last_name"], rec["country"])
    else:
        rec["email"] = gen.string_noise(rec["email"], 0.05)

    if r.random() > 0.98:
        rec["country"] = r.choice(COUNTRIES)
    return rec


def _conversation_turns(rec: dict) -> list[tuple[str, str, str | None]]:
    """Render one record as (role, text, tool) turns via fixed templates.

    The extraction stage's regexes (stages/extract.py) are the inverse of
    these templates; keep the two in sync.
    """
    name = f"{rec['first_name']} {rec['last_name']}"
    turns = [
        ("user", f"hi, i am {name} and i need help with my account.", None),
        ("assistant", "of course. can you verify your identity for me?", None),
    ]
    segs = []
    if rec["dob"]:
        segs.append(f"dob: {rec['dob']}")
    if rec["email"]:
        segs.append(f"email: {rec['email']}")
    if rec["phone_number"]:
        segs.append(f"phone: {rec['phone_number']}")
    turns.append(("user", ("sure. " + " ; ".join(segs)) if segs else "sorry, i do not have my documents handy.", None))
    kyc = []
    if rec["national_id"]:
        kyc.append(f"national_id={rec['national_id']}")
    kyc.append(f"country={rec['country']}")
    turns.append(("tool", "kyc result: " + " ; ".join(kyc), "kyc_lookup"))
    if rec["address"]:
        turns.append(("user", f"my address is {rec['address']}, {rec['city']}", None))
    else:
        turns.append(("user", f"i currently live in {rec['city']}", None))
    turns.append(("assistant", "thank you, your identity has been verified.", None))
    return turns


def generate_corpus(n_entities: int = 200, dup_multiplier: int = 3,
                    doppelganger_rate: float = 0.05, seed: int = 42,
                    base_ts: datetime = datetime(2025, 1, 1)):
    """Returns (transcripts: pa.Table, truth: pa.Table, records: list[dict]).

    ``records`` (one per conversation, with the raw noisy field values and
    ``conv_id``/``entity_id``) is kept for tests that verify extraction and
    normalization against the known inputs.
    """
    gen = _Gen(seed)
    entities = generate_entities(gen, n_entities, doppelganger_rate)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    truth_conv, truth_entity = [], []
    records = []
    conv_counter = 0
    for entity in entities:
        base = dict(entity)
        base["dob"] = base["dob"].strftime("%Y-%m-%d")
        n_dupes = gen.rng.randint(0, dup_multiplier)
        observations = [base] + [_noisy_record(gen, entity) for _ in range(n_dupes)]
        for rec in observations:
            conv_id = gen.make_uuid()
            rec = dict(rec)
            rec["conv_id"] = conv_id
            rec["entity_id"] = entity["entity_id"]
            if not isinstance(rec["dob"], (str, type(None))):
                rec["dob"] = rec["dob"].strftime("%Y-%m-%d")
            records.append(rec)
            truth_conv.append(conv_id)
            truth_entity.append(entity["entity_id"])
            t0 = base_ts + timedelta(minutes=10 * conv_counter)
            for ti, (role, text, tool) in enumerate(_conversation_turns(rec)):
                conv_ids.append(conv_id)
                turn_idxs.append(ti)
                roles.append(role)
                texts.append(text)
                tools.append(tool)
                tss.append(t0 + timedelta(seconds=30 * ti))
            conv_counter += 1
    transcripts = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    truth = pa.table({
        "conv_id": pa.array(truth_conv, pa.string()),
        "entity_id": pa.array(truth_entity, pa.string()),
    })
    return transcripts, truth, records


def write_corpus(out_dir: str, shards: int = 8, **kwargs) -> dict:
    """Write transcripts (sharded by conv hash so reads parallelize) +
    truth parquet under ``out_dir``. Idempotent for identical kwargs."""
    import json
    import os
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "corpus_meta.json")
    meta = {"kwargs": {k: (v if not isinstance(v, datetime) else v.isoformat())
                       for k, v in kwargs.items()}, "shards": shards}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == meta and os.path.isdir(os.path.join(out_dir, "transcripts")):
                return meta
    transcripts, truth, _ = generate_corpus(**kwargs)
    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    # shard by conv_id hash so each file holds whole conversations
    import zlib
    import numpy as np
    cids = transcripts["conv_id"].to_pylist()
    shard_of = np.fromiter((zlib.crc32(c.encode()) % shards for c in cids),
                           count=len(cids), dtype=np.int64)
    for s in range(shards):
        mask = pa.array(shard_of == s)
        pq.write_table(transcripts.filter(mask), os.path.join(tdir, f"part-{s:05d}.parquet"))
    pq.write_table(truth, os.path.join(out_dir, "truth.parquet"))
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta
