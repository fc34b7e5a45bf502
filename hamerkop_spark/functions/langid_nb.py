"""Statistical Latin-script language ID: character-trigram Naive Bayes.

The reference wraps `langdetect` (hamerkop/lang.py:421-437) — a
char-n-gram Naive Bayes over Wikipedia profiles. That package is not
installable here, so parity is re-created from first principles: a
trigram NB is TRAINED at import time on embedded per-language frequent-
word lexicons (public linguistic knowledge, the same kind of profile
data langdetect ships), then SCORED fully JVM-side — each language's
log-odds weights live in a literal `create_map` and the text's trigram
array folds through one native `aggregate` per language, argmax via a
single `array_max` over (score, -idx) structs (the linear-tree shape;
a when/otherwise running-best would re-inline the greatest() subtree
per step — see kmeans_centroids' nearest()).

This upgrades the Latin branch of T17 from 4-stopword voting to a
statistical model; `detect_lang` (functions/langid.py) stays untouched
so the `text_langid` driver oracle remains SQL-expressible. Use
`detect_lang_nb` when Latin-script discrimination quality matters;
accuracy on the held-out fixture is asserted in
tests/test_quality_langid.py.
"""

from __future__ import annotations

import math
from collections import Counter
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hamerkop_spark.functions.langid import LATIN_ORDER

# Per-language frequent-word lexicons (top function/content words; public
# linguistic knowledge). Training corpus for the trigram NB — the
# held-out eval sentences in tests use inflected forms and words NOT in
# these lists, so the fixture genuinely tests generalization.
LEXICON = {
    "eng": """the of and to in is was for that with his on as are at be
        this have from he which not had her she they you were all we can
        their has there been one would will what about more when who out
        if its into only time could them some him see other than then now
        people just over also your years most these new very after first
        where much before right too any same another know while last""",
    "fra": """le de la et les des en un du une que dans qui est pour au
        sur se pas plus par il ne avec son être mais nous comme ou si
        leur elle tout deux ses aux même fait aussi bien où sans peut
        cette ces votre sont faire autre depuis entre encore ans toujours
        était très moins monde jour temps après avant notre chez années""",
    "spa": """de la que el en los se del las un por con una su para es al
        lo como más pero sus le ha me sin sobre este ya entre cuando todo
        esta ser son dos también fue había era muy hasta desde está mi
        porque qué sólo han yo hay vez puede todos así nos ni parte tiene
        él uno donde bien tiempo mismo ese ahora cada vida otro después""",
    "deu": """der die und in den von zu das mit sich des auf für ist im
        dem nicht ein eine als auch es an werden aus er hat dass sie nach
        wird bei einer um am sind noch wie einem über einen so zum war
        haben nur oder aber vor zur bis mehr durch man sein wurde sei
        wenn unter wir diese alle seine können müssen jahr jahre gegen""",
    "por": """de que e o da em do a para é com um os no se na por mais as
        dos como mas foi ao ele das tem à seu sua ou ser quando muito há
        nos já está eu também só pelo pela até isso ela entre era depois
        sem mesmo aos ter seus quem nas me esse eles estão você tinha
        foram essa num nem suas meu às minha têm numa pelos qual será""",
    "ita": """di che e il la in a per è un sono una con non le si da nel
        ha come dei lo più anche questo della gli ma se hanno essere alla
        su degli sul nella loro tutti stato dal questa sua quando era
        due anni fa ancora viene fare può aveva dove molto senza essa
        quindi cui nei ogni tra stata quella tutto queste erano fra
        oggi giorno giovane maggio viaggio famiglia figlio moglie meglio
        migliore parlare andare lavorare mangiare guardare arrivano
        stavano davano andava sembrava proprio dopo prima sempre già""",
    "nld": """de van het een en in is dat op te zijn met voor niet aan er
        om ook als dan maar bij of uit naar door over ze nog worden wordt
        heeft onder tegen deze meer wel tussen tot hij moet werd al zich
        hun naar die twee heel had kunnen geen toch zal eerste jaar werd
        onze na mijn hem haar alleen andere alle veel toen werden wat""",
    "pol": """w i z na do nie się że jest to o jak po co za od a ale przez
        tak ma być jego tym ich tylko już może przy bardzo dla przed
        jednak przede wszystkim kiedy także nawet gdzie czy żeby która
        który które roku lat jeszcze został była było były będzie można
        dwa jako sobie tego ten tej oraz pod bez nad ani ich mnie nam
        również często później należy więc dziś wśród około złoty łatwo
        słowo głos ważne różne pierwszego drugiego wszystkiego dlatego
        dlaczego między człowiek życie praca miasto świat ludzie dzień""",
    "tur": """bir ve bu da de için ile olarak daha ne gibi çok ama o en
        kadar sonra var olan her iki ise göre ancak yüzden aynı diye
        kendi ilk başka şey büyük yeni niye zaman iyi olduğu bütün şu
        değil biz ben sen onlar yıl gün dünya ülke türkiye insan hayat
        yer söz konu üzere dolayı önce bugün şimdi neden nasıl hangi""",
    "vie": """của và là có trong được các một những người này cho không
        với để đã trên đến khi về như cũng từ nhiều nhưng ra tại theo sẽ
        đó còn phải vào làm bị hơn thì việc sau nếu đây nói lại mình hay
        rằng ngày năm nước nhà nơi chỉ chúng rất mới vẫn nào đang bởi""",
    "ind": """yang dan di ini itu dengan untuk tidak dari dalam akan pada
        juga ke ada adalah oleh saya kita mereka bisa telah atau sudah
        tersebut karena lebih harus dapat satu dua orang tahun hari saat
        namun seperti hingga masih banyak hanya setelah bahwa kami anda
        ia kepada secara antara sebagai sehingga belum sangat semua""",
    "swa": """ya na wa kwa ni za katika la kuwa hiyo kama hii kwamba au
        yake watu zaidi wake hata lakini sasa tu pia baada yao kila moja
        mbili wengi sana bila kabla hadi tangu wakati mwaka siku nchi
        serikali watu kazi maji chakula nyumba mtu mtoto wanawake
        wanaume kusema kufanya kupata kwenda kuja kuona kubwa ndogo""",
    "ces": """a se na v je že o s z do i to by ale jako za po od pro už
        při nebo jen podle však které který která bylo byl být jsou jsem
        jsme jste má mít ze jeho její jejich tak tam kde kdy co čí aby
        pak ještě také může mezi před bez proti není byla byly let roku
        dnes velmi první další každý všech nich tím než si svou svého""",
    "ron": """și de a în la cu pe care este pentru au din sau mai dar nu
        se ce s-a fost sunt fi o un una unei unui după prin între dacă
        când cum fără până asupra această acest aceste acestor lor său
        sa îi le ei el noi voi ani zi țară lume oameni viață timp loc
        foarte apoi chiar numai tot toate față deja spre către acolo""",
    "hun": """a az és hogy nem is egy meg ez de van volt el mint már csak
        ki még mi ha vagy fel le be azt ezt aki ami amely amikor után
        ellen alatt felett között által miatt nélkül óta majd most itt
        ott így úgy mert hiszen tehát pedig minden sok kevés nagy kis
        új régi jó rossz év nap ember világ ország élet idő hely ső""",
    "swe": """och att det i som en på är av för med till den har de inte
        om ett han men var jag sig från vi så kan man när år under också
        efter upp vid mot ska skulle kommer eller sin där bara blir
        mycket nu få se få alla sedan över än något någon några vad
        hade finns får sina dessa detta denna vilket här våra sverige""",
    "dan": """og i at det er en til på de med han af for ikke der var mig
        sig men et har om vi min havde ham hun nu over da fra du ud sin
        dem os op man hans hvor eller hvad skal selv her alle vil blev
        kunne ind når være dog noget ville jo deres efter ned skulle
        denne kom mod år også under mange siger blive hele lige meget""",
    "fin": """ja on ei se että oli hän mutta ovat kun niin myös jo tai
        mukaan vain sen sitä kuin ole vuonna hänen jotka joka jossa mitä
        tämä nämä näin ollut olla olen olet olemme siinä siitä vielä
        kaikki kaksi vuotta päivä aika ihminen maa maailma elämä työ
        sanoo sanoi tulee tuli voi voidaan pitää täytyy ennen jälkeen
        sitten koska hyvin paljon kuitenkin esimerkiksi erityisesti
        jonka joiden kanssa välillä ensimmäinen viimeinen seuraava
        useita monta asiasta paikasta ihmisistä vuosista taloissa""",
}

#: langdetect-style output granularity on held-out text (measured by
#: tests/test_quality_langid.py); chosen |weights| per language.
TOP_K = 220
_ALPHA = 0.5


def _word_trigrams(word: str) -> list[str]:
    s = f" {word} "
    return [s[i : i + 3] for i in range(len(s) - 2)]


@lru_cache(maxsize=4)
def train_trigram_nb(top_k: int = TOP_K) -> dict[str, dict[str, float]]:
    """Train the trigram NB on the embedded lexicons: per language, the
    `top_k` most discriminative trigrams by log-odds vs the cross-
    language background. Deterministic (no RNG), cached per process."""
    counts: dict[str, Counter] = {}
    for lang, words in LEXICON.items():
        counts[lang] = Counter(
            g for w in words.split() for g in _word_trigrams(w.lower())
        )
    vocab = sorted(set().union(*counts.values()))
    v = len(vocab)
    logp: dict[str, dict[str, float]] = {}
    for lang, c in counts.items():
        tot = sum(c.values())
        logp[lang] = {
            g: math.log((c[g] + _ALPHA) / (tot + _ALPHA * v)) for g in vocab
        }
    n_langs = len(counts)
    bg = {
        g: math.log(
            sum(math.exp(logp[lang][g]) for lang in counts) / n_langs
        )
        for g in vocab
    }
    weights: dict[str, dict[str, float]] = {}
    for lang in counts:
        odds = {g: logp[lang][g] - bg[g] for g in vocab}
        top = sorted(odds.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        # positive log-odds only: an absent trigram scores the background
        weights[lang] = {
            g: round(w, 6) for g, w in top if w > 0
        }
    return weights


def _text_trigrams(c: Column) -> Column:
    """Trigram array of the lowercased, space-padded, whitespace-collapsed
    text — matching the ' word '-padded training shape at boundaries."""
    s = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(c), r"\s+", " "),
        F.lit(" "),
    )
    n = F.length(s) - 2
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.substring(s, i, F.lit(3)),
        )
    )


def nb_lang_scores(c: Column, langs: list[str] | None = None) -> list[Column]:
    """One native score column per language: the text's trigram array
    folded through that language's literal weight map (absent trigram =>
    0, the background). No UDF, no shuffle — pure codegen."""
    langs = langs or LATIN_ORDER
    weights = train_trigram_nb()
    tri = _text_trigrams(c)
    def folder(m):
        # closure factory: a `m=m` default param would make PySpark see a
        # 3-arg lambda and reject the higher-order function call
        return lambda acc, g: acc + F.coalesce(m[g], F.lit(0.0))

    out = []
    for lang in langs:
        w = weights[lang]
        entries = [F.lit(x) for kv in w.items() for x in kv]
        m = F.create_map(*entries)
        out.append(F.aggregate(tri, F.lit(0.0), folder(m)))
    return out


def detect_latin_lang_nb(c: Column, langs: list[str] | None = None) -> Column:
    """Best Latin-script language by trigram-NB score. Argmax via ONE
    array_max over (score, -idx) structs — each score subtree appears
    exactly once (a running-best when-chain re-inlines the comparison
    subtree per step; see the kmeans nearest() note)."""
    langs = langs or LATIN_ORDER
    scores = nb_lang_scores(c, langs)
    arr = F.array(
        *[
            F.struct(s.alias("s"), F.lit(-i).alias("i"))
            for i, s in enumerate(scores)
        ]
    )
    best_idx = -F.array_max(arr)["i"]
    m = F.create_map(
        *[F.lit(x) for i, lang in enumerate(langs) for x in (i, lang)]
    )
    return m[best_idx]


def detect_lang_nb(
    df: DataFrame, text_col: str = "text", out_col: str = "lang"
) -> DataFrame:
    """T17 upgraded: script-profile detection for non-Latin scripts (the
    25 script classes + ukr/urd/fas refinements from detect_lang), with
    the Latin branch decided by the trained trigram NB instead of
    stopword voting. The heuristic `detect_lang` remains for
    oracle-expressible paths; this is the quality path."""
    from hamerkop_spark.functions.langid import (
        SCRIPT_CLASSES, SCRIPT_REFINEMENTS, script_char_count,
    )

    c = F.col(text_col)
    expr = detect_latin_lang_nb(c)
    lowered = F.lower(c)
    total = F.greatest(F.length(c), F.lit(1))
    for name, cls, iso, tenths in reversed(SCRIPT_CLASSES):
        verdict = F.lit(iso)
        for marker_cls, refined in reversed(SCRIPT_REFINEMENTS.get(name, [])):
            verdict = F.when(
                script_char_count(lowered, marker_cls) > 0, F.lit(refined)
            ).otherwise(verdict)
        expr = F.when(
            script_char_count(c, cls) * 10 > total * tenths, verdict
        ).otherwise(expr)
    return df.withColumn(out_col, expr)
