"""Deterministic pure-Python English lemmatizer.

The reference lemmatizes each English token twice — verb POS first, then the
noun default (ocr_search ``src/py/tokenize_and_stem.py:46-47`` using NLTK's
WordNetLemmatizer). NLTK/WordNet are not available in this environment, so the
engine ships a deterministic reimplementation of the same *shape* of algorithm
(WordNet's published "morphy" procedure: exception lists first, then
suffix-detachment rules validated against a lexicon). Results are locked by
golden fixtures; where the rule output is not a known word the input is
returned unchanged (conservative: never over-stem unknown vocabulary).

Public knowledge only: the morphy algorithm is documented in the WordNet
manuals (Princeton WordNet, "Morphy" man page).
"""

from __future__ import annotations

# --- irregular inflection exception maps (small, common-word subset) --------

VERB_EXCEPTIONS: dict[str, str] = {
    "am": "be", "are": "be", "is": "be", "was": "be", "were": "be", "been": "be",
    "has": "have", "had": "have",
    "does": "do", "did": "do", "done": "do",
    "went": "go", "gone": "go", "goes": "go",
    "ran": "run", "running": "run",
    "took": "take", "taken": "take",
    "came": "come", "coming": "come",
    "saw": "see", "seen": "see",
    "made": "make", "making": "make",
    "said": "say",
    "got": "get", "gotten": "get", "getting": "get",
    "gave": "give", "given": "give", "giving": "give",
    "knew": "know", "known": "know",
    "thought": "think",
    "found": "find",
    "left": "leave", "leaving": "leave", "leaves": "leave",
    "felt": "feel",
    "kept": "keep",
    "held": "hold",
    "brought": "bring",
    "bought": "buy",
    "built": "build",
    "sent": "send",
    "spent": "spend",
    "meant": "mean",
    "met": "meet",
    "paid": "pay",
    "told": "tell",
    "sold": "sell",
    "stood": "stand",
    "understood": "understand",
    "wrote": "write", "written": "write", "writing": "write",
    "spoke": "speak", "spoken": "speak",
    "broke": "break", "broken": "break",
    "chose": "choose", "chosen": "choose",
    "drove": "drive", "driven": "drive", "driving": "drive",
    "ate": "eat", "eaten": "eat",
    "fell": "fall", "fallen": "fall",
    "grew": "grow", "grown": "grow",
    "drew": "draw", "drawn": "draw",
    "flew": "fly", "flown": "fly",
    "threw": "throw", "thrown": "throw",
    "wore": "wear", "worn": "wear",
    "won": "win", "winning": "win",
    "lost": "lose", "losing": "lose",
    "sat": "sit", "sitting": "sit",
    "set": "set", "setting": "set",
    "put": "put", "putting": "put",
    "read": "read", "reading": "read",
}

NOUN_EXCEPTIONS: dict[str, str] = {
    "mice": "mouse", "men": "man", "women": "woman", "children": "child",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "oxen": "ox",
    "leaves": "leaf", "lives": "life", "knives": "knife", "wives": "wife",
    "wolves": "wolf", "halves": "half", "shelves": "shelf",
    "data": "datum", "criteria": "criterion", "phenomena": "phenomenon",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "analyses": "analysis", "axes": "axis", "crises": "crisis",
    "theses": "thesis", "bases": "basis", "series": "series",
    "species": "species",
}

# --- morphy-style suffix detachment rules (ordered) --------------------------

NOUN_RULES: tuple[tuple[str, str], ...] = (
    ("ses", "s"), ("xes", "x"), ("zes", "z"), ("ches", "ch"), ("shes", "sh"),
    ("ies", "y"), ("ves", "f"), ("men", "man"), ("s", ""),
)

VERB_RULES: tuple[tuple[str, str], ...] = (
    ("ies", "y"), ("es", "e"), ("es", ""), ("ed", "e"), ("ed", ""),
    ("ing", "e"), ("ing", ""), ("s", ""),
)

# Lexicon used to validate suffix-rule outputs. Morphy validates against the
# full WordNet lexicon; this engine embeds a compact common-word list plus the
# corpus-domain vocabulary. A rule result NOT in the lexicon is rejected and
# the token passes through unchanged — deterministic and conservative.
LEXICON: frozenset[str] = frozenset("""
ability able account act action add address age agree air allow amount animal
answer appear apply area argue arm arrive art ask assume attack author avoid
baby back bad bag ball bank base batch be bear beat become bed begin behavior
believe benefit big bill bird bit block blood board boat body book box boy
break bring brother budget build bus business buy call camera can car card care
carry case cat catch cause cell center century chair chance change character
charge check child choice choose church city claim class clean clear close
cloud coach code cold collect college color column come common company compare
computer concern condition consider contain continue control cost count country
course court cover create crime culture cup customer cut dark data datum day
dead deal debate decide decision deep degree describe design detail develop
device die difference dinner direction discover discuss disease do doctor dog
door draw dream drive drop dup duplicate during duty ear early earn earth eat
economy edge education effect effort egg eight element else employee end
energy engine enjoy enter entire environment error establish event evidence
exact example exist expect experience explain express extract eye face fact
fail fall family fast father fear feel few field fight figure file fill filter
final find fine finger finish fire firm fish fit five floor fly focus follow
food foot force forget form four frame free friend front fruit full fund future
game garden gas gather gene general get girl give glass go goal good govern
grain graph great group grow growth guess gun guy hair half hand hang happen
hard hash hat have head health hear heart heat heavy help hide high history
hit hold home hope horse hospital hot hotel hour house huge human hundred
husband idea image impact improve include increase index indicate industry
information inside instead institution interest international interview
investment involve issue item job join joy judge jump just keep key kid kill
kind kitchen know knowledge lack land language large last late laugh law lawyer
lay lead leaf learn least leave leg less letter level lie life light like
likely limit line list listen little live local long look lose loss lot love
low machine magazine main maintain major make man manage manager many map
market marriage match material matter may mean measure meat media medical meet
member memory mention merge message method middle might military million mind
minute miss mission model modern moment money month morning mother mouse mouth
move movie music must name nation nature near need network never new news
night nine node none north note nothing notice number occur offer office
officer official oil old one open operation opportunity option order
organization other outside over owner page pain paint pair paper parent park
part partner party pass past path patient pattern pay peace people perform
performance perhaps period person phone photo physical pick picture piece
place plan plant play player point police policy political poor popular
population position positive possible power practice prepare present president
pressure prevent price print private probably problem process produce product
production professor program project property protect prove provide public
pull purpose push put quality query question quick quite race radio raise
range rate reach read ready real reality realize reason receive recent
recognize record reduce reflect region relate remain remember remove report
represent require research resource respond response rest result return reveal
rich ride right rise risk road rock role room row rule run safe same save say
scan scene school science score sea season seat second section security see
seek seem sell send sense series serious serve service set seven shake shape
share shift shoot short shot should shoulder show side sign significant
similar simple since sing single sister sit site situation six size skill
skin slow small smile social society soldier some song sort sound source south
space spark speak special speech spend sport spring staff stage stand standard
star start state statement station stay step still stock stop store story
strategy stream street strong structure student study stuff style subject
success such suffer suggest summer support sure surface system table take
talk task tax teach teacher team technology television tell ten tend term
test text thank theory thing think third thousand threat three through throw
time tiny today together tonight top total touch tough toward town trade
training travel treat treatment tree trial trip trouble true truth try turn
two type understand unit use usual value various vector victim view violence
visit voice vote wait walk wall want war watch water way weapon wear week
weight west western where whether white whole wide wife win window wish woman
wonder word work worker world worry write writer wrong yard yeah year yes yet
young
""".split())


def _apply_rules(word: str, rules: tuple[tuple[str, str], ...]) -> str | None:
    """Return the first suffix-rule transformation found in the lexicon."""
    for suffix, repl in rules:
        if word.endswith(suffix) and len(word) > len(suffix):
            candidate = word[: len(word) - len(suffix)] + repl
            if len(candidate) > 1 and candidate in LEXICON:
                return candidate
    return None


def lemmatize(word: str, pos: str = "n") -> str:
    """Lemmatize ``word`` for part-of-speech ``pos`` ('n' or 'v').

    Mirrors the two lookup layers of WordNet morphy: irregular-exception map
    first, then validated suffix detachment; unchanged if neither applies.
    """
    if pos == "v":
        exc, rules = VERB_EXCEPTIONS, VERB_RULES
    else:
        exc, rules = NOUN_EXCEPTIONS, NOUN_RULES
    hit = exc.get(word)
    if hit is not None:
        return hit
    # words already in base form stay untouched for the noun 's' rule ambiguity
    ruled = _apply_rules(word, rules)
    return ruled if ruled is not None else word


def lemmatize_double(word: str) -> str:
    """The reference's composition: lemmatize(lemmatize(w, pos='v')) —
    verb pass first, then the noun default (tokenize_and_stem.py:47)."""
    return lemmatize(lemmatize(word, pos="v"), pos="n")
