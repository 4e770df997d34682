"""Multilingual stopword union — the reference's ``stopwords.words()``
semantics, shipped as data (VERDICT r2 #6).

The reference calls NLTK's ``stopwords.words()`` with NO language argument
(``src/py/tokenize_and_stem.py:24,42``), which concatenates every language
list in the downloaded corpus. Two facts make a faithful packaged stand-in
possible without the NLTK download:

1. **Only ASCII tokens ever reach the stopword filter.** The chain routes
   tokens by ``isascii()`` BEFORE the filter (``tokenize_and_stem.py:36-43``
   — SURVEY.md O10 step 4/5); non-ASCII tokens go to the CJK branch. Every
   non-ASCII entry of NLTK's union (the Cyrillic/Greek/Arabic/Indic lists,
   and every accented Latin word like ``été`` or ``für``) is therefore
   FUNCTIONALLY INERT in the reference too. The behavioral content of the
   union is exactly its ASCII subset.
2. The per-language lists are published public corpus data; the ASCII
   subsets below reproduce the high-frequency function words of the
   Latin-script lists (abridged, not a byte copy of any NLTK release).

For strict byte-parity with a specific NLTK installation, pass
``nltk_stopword_union()`` (import-guarded loader) instead — same seam,
``TokenizePages(stopwords=...)``; both modes are golden-fixture-locked in
``tests/test_tokenizer_multilingual.py``.
"""

from __future__ import annotations

from .tokenizer import ENGLISH_STOPWORDS

# ASCII function words per Latin-script language (public stopword data,
# abridged to the entries that can actually match an ASCII token).
_LATIN_SCRIPT_LISTS: dict[str, str] = {
    "french": """
        au aux avec ce ces dans de des du elle en et eux il ils je la le les
        leur lui ma mais me meme mes moi mon ne nos notre nous on ou par pas
        pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos
        votre vous c d j l m n s t y ete etee etees etes etant suis es est
        sommes sont serai seras sera serons serez seront serais serait
        serions seriez seraient etais etait etions etiez etaient fus fut
        furent sois soit soyons soyez soient ai as avons avez ont aurai
        auras aura aurons aurez auront avais avait avions aviez avaient eus
        eut eurent aie aies ait ayons ayez aient
    """,
    "german": """
        aber alle allem allen aller alles als also am an ander andere
        anderem anderen anderer anderes andern andern anders auch auf aus
        bei bin bis bist da damit dann der den des dem die das dass derselbe
        derselben denselben desselben demselben dieselbe dieselben dasselbe
        dazu dein deine deinem deinen deiner deines denn doch dort durch
        ein eine einem einen einer eines einig einige einigem einigen
        einiger einiges einmal er ihn ihm es etwas euer eure eurem euren
        eurer eures gegen gewesen hab habe haben hat hatte hatten hier hin
        hinter ich mich mir ihr ihre ihrem ihren ihrer ihres euch im in
        indem ins ist jede jedem jeden jeder jedes jene jenem jenen jener
        jenes jetzt kann kein keine keinem keinen keiner keines koennen
        machen man manche manchem manchen mancher manches mein meine meinem
        meinen meiner meines mit muss musste nach nicht nichts noch nun nur
        ob oder ohne sehr sein seine seinem seinen seiner seines selbst
        sich sie sind so solche solchem solchen solcher solches soll
        sollte sondern sonst um und uns unsere unserem unseren unser
        unseres unter viel vom von vor wann war waren warst was weg weil
        weiter welche welchem welchen welcher welches wenn werde werden wie
        wieder will wir wird wirst wo wollen wollte zu zum zur zwar
        zwischen
    """,
    "spanish": """
        de la que el en y a los del se las por un para con no una su al lo
        como mas pero sus le ya o este si porque esta entre cuando muy sin
        sobre tambien me hasta hay donde quien desde todo nos durante todos
        uno les ni contra otros ese eso ante ellos e esto mi antes algunos
        que unos yo otro otras otra el tanto esa estos mucho quienes nada
        muchos cual poco ella estar estas algunas algo nosotros mi mis tu
        te ti tus ellas nosotras vosotros vosotras os mio mia mios mias
        tuyo tuya tuyos tuyas suyo suya suyos suyas nuestro nuestra
        nuestros nuestras vuestro vuestra vuestros vuestras esos esas
        estoy estas esta estamos estais estan este estes estemos esteis
        esten sere seras sera seremos sereis seran seria serias seriamos
        seriais serian era eras eramos erais eran fui fuiste fue fuimos
        fuisteis fueron soy eres es somos sois son tengo tienes tiene
        tenemos teneis tienen he has ha hemos habeis han haya
    """,
    "italian": """
        ad al allo ai agli all agl alla alle con col coi da dal dallo dai
        dagli dall dagl dalla dalle di del dello dei degli dell degl della
        delle in nel nello nei negli nell negl nella nelle su sul sullo sui
        sugli sull sugl sulla sulle per tra contro io tu lui lei noi voi
        loro mio mia miei mie tuo tua tuoi tue suo sua suoi sue nostro
        nostra nostri nostre vostro vostra vostri vostre mi ti ci vi lo la
        li le gli ne il un uno una ma ed se perche anche come dov dove che
        chi cui non piu quale quanto quanti quanta quante quello quelli
        quella quelle questo questi questa queste si tutto tutti a c e o
        ho hai ha abbiamo avete hanno sono sei siamo siete era eravamo
        erano sara saranno sarebbe
    """,
    "portuguese": """
        de a o que e do da em um para com nao uma os no se na por mais as
        dos como mas ao ele das tem seu sua ou ser quando muito nos ja eu
        tambem so pelo pela ate isso ela entre era depois sem mesmo aos
        ter seus quem nas me esse eles estao voce tinha foram essa num nem
        suas meu as minha tem numa pelos elas havia seja qual sera nos
        tenho lhe deles essas esses pelas este fosse dele tu te voces vos
        lhes meus minhas teu tua teus tuas nosso nossa nossos nossas dela
        delas esta estes estas aquele aquela aqueles aquelas isto aquilo
        estou esta estamos estao estive esteve estivemos estiveram seria
        sou somos sao fui foi fomos
    """,
    "dutch": """
        de en van ik te dat die in een hij het niet zijn is was op aan met
        als voor had er maar om hem dan zou of wat mijn men dit zo door
        over ze zich bij ook tot je mij uit der daar haar naar heb hoe heeft
        hebben deze u want nog zal me zij nu ge geen omdat iets worden
        toch al waren veel meer doen toen moet ben zonder kan hun dus
        alles onder ja eens hier wie werd altijd doch wordt wezen kunnen
        ons zelf tegen na reeds wil kon niets uw iemand geweest andere
    """,
    "danish": """
        og i jeg det at en den til er som pa de med han af for ikke der
        var mig sig men et har om vi min havde ham hun nu over da fra du
        ud sin dem os op man hans hvor eller hvad skal selv her alle vil
        blev kunne ind nar vaere dog noget ville jo deres efter ned skulle
        denne end dette mit ogsa under have dig anden hende mine alt meget
        sit sine vor mod disse hvis din nogle hos blive mange ad bliver
        hendes vaeret thi jer sadan
    """,
    "norwegian": """
        og i jeg det at en et den til er som pa de med han av ikke ikkje
        der sa var meg seg men ett har om vi min mitt ha hadde hun na over
        da ved fra du ut sin dem oss opp man kan hans hvor eller hva skal
        selv sjol her alle vil bli ble blei bli'e kunne inn nar vaere kom
        noen noe ville dere som deres kun ja etter ned skulle denne for
        deg si sine sitt mot a meget hvorfor dette disse uten hvordan
        ingen din ditt blir samme hvilken hvilke sann inni mellom var
        hver hvem vors hvis bade bare enn fordi foer mange ogsaa slik
        vaert baade
    """,
    "swedish": """
        och det att i en jag hon som han pa den med var sig for sa till ar
        men ett om hade de av icke mig du henne da sin nu har inte hans
        honom skulle hennes dar min man ej vid kunde nagot fran ut nar
        efter upp vi dem vara vad over an dig kan sina har ha mot alla
        under nagon eller allt mycket sedan ju denna sjalv detta at utan
        varit hur ingen mitt ni bli blev oss din dessa nagra deras blir
        mina samma vilken er sadan vara dina till och sadana vem vilket
        sitta sadana vart dina vars vilka ditt om sadant
    """,
    "finnish": """
        olla olen olet on olemme olette ovat ole oli olisi olisit olisin
        olisimme olisitte olisivat olit olin olimme olitte olivat ollut
        olleet en et ei emme ette eivat mina minun minut minua minussa
        minusta minuun minulla minulta minulle sina sinun sinut sinua
        sinussa sinusta sinuun sinulla sinulta sinulle han hanen hanet
        hanta hanessa hanesta haneen hanella hanelta hanelle me meidan
        meidat meita meissa meista meihin meilla meilta meille te teidan
        teidat teita teissa teista teihin teilla teilta teille he heidan
        heidat heita heissa heista heihin heilla heilta heille tama taman
        tata tassa tasta tahan talla talta talle tana taksi tuo tuon tuota
        tuossa tuosta tuohon tuolla tuolta tuolle tuona tuoksi se sen sita
        siina siita siihen silla silta sille sina siksi nama naiden naita
        naissa naista naihin nailla nailta naille naina naiksi nuo noiden
        noita noissa noista noihin noilla noilta noille noina noiksi ne
        niiden niita niissa niista niihin niilla niilta niille niina
        niiksi kuka kenen kenet keta kenessa kenesta keneen kenella
        kenelta kenelle kenena keneksi mika minka minkan mita missa mista
        mihin milla milta mille mina miksi kun niin nyt ja eli vai mutta
        etta jos koska kuin vaan vain sekä
    """,
    "turkish": """
        acaba ama aslinda az bazi belki biri birkac birsey biz bu cok
        cunku da daha de defa diye eger en gibi hem hep hepsi her hic icin
        ile ise kez ki kim mi mu mu nasil ne neden nerde nerede nereye
        nicin niye o sanki sey siz su tum ve veya ya yani
    """,
    "indonesian": """
        yang untuk pada ke para namun menurut antara dia dua ia seperti
        jika jika sehingga kembali dan tidak ini karena kepada oleh saat
        harus sementara setelah belum kami sekitar bagi serta di dari
        telah sebagai masih hal ketika adalah itu dalam bisa bahwa atau
        hanya kita dengan akan juga ada mereka sudah saya terhadap secara
        agar lain anda begitu mengapa kenapa yaitu yakni daripada itulah
        lagi maka tentang demi dimana kemana pula sambil sebelum sesudah
        supaya guna kah pun sampai sedangkan selagi sementara tetapi
        apakah kecuali sebab selain seolah seraya seterusnya tanpa agak
        boleh dapat dsb dst dll dahulu dulunya anu demikian tapi ingin
        juga nggak mari nanti melainkan oh ok seharusnya sebetulnya
        setiap setidaknya sesuatu pasti saja toh walau tolong tentu amat
        apalagi bagaimanapun
    """,
    "romanian": """
        acea aceasta aceasta aceea acei aceia acel acela acele acelea
        acest acesta aceste acestea acestei acestia acestui acolo acum ai
        aia aibe aici al ale alea altceva altcineva am ar are asa asta
        astea astia asupra au avea avem aveti azi ca cand care carei
        caror carui cat cate cati catre ce cel ceva chiar cind cine
        cineva cit cita cite citi conform cu cum cumva da daca dar datorita
        de deci deja deoarece departe desi din dinaintea dintr dintre drept
        dupa ea ei el ele eram este esti eu face fara fi fie fiecare fii
        fim fiti iar ii il imi in inainte inapoi inca incit intr intre isi
        iti la langa le li lor lui mai mea mei mele mereu meu mi mine mult
        multa multi ne nicaieri nici nimeni nimic niste noastra noastre
        noi nostri nostru nu ori oricand oricare oricat orice oricine
        oricum oriunde pana pe pentru peste pic prea prima primul prin
        printr sa sai sale sau se si sint sintem spre sub sunt suntem
        sunteti te ti toata toate tot toti totusi tu un una unde undeva
        unei unele uneori unor va voastra voastre voi vostri vostru vouă
        vreo vreun
    """,
    "hungarian": """
        a ahogy ahol aki akik akkor alatt altal amely amelyek amelyekben
        amelyeket amelyet amelynek ami amit amolyan amig amikor at abban
        ahhoz annak arra arrol az azok azon azt azzal azert aztan azutan
        azonban bar be belul benne cikk cikkek cikkeket csak de e eddig
        egesz egy egyes egyetlen egyeb egyik egyre ekkor el elég ellen elo
        eloszor elott elso en eppen ebben ehhez emilyen ennek erre ez
        ezt ezek ezen ezzel ezert fel felé hanem hiszen hogy hogyan igy
        illetve ill ilyen ilyenkor ison itt jo jol jobban kell kellett
        keresztul ki kivul kozott kozul legalabb lehet lehetett legyen
        lenne lenni lesz lett maga magat majd mar mas masik meg meg
        mellett mert mely melyek mi mit mig miert milyen mikor minden
        mindent mindenki mindig mint mintha mivel most nagy nagyobb
        nagyon ne nehany nekem neki nem nincs olyan ott ossze o ok oket
        pedig persze ra s sajat sem semmi sok sokat sokkal szamara szemben
        szerint szinte talan tehat teljes tovabb tovabba tobb ugy ugyanis
        uj ujabb ujra utan utana utolso vagy vagyis valaki valami
        valamint valo vagyok van vannak volt voltam voltak voltunk vissza
        vele viszont volna
    """,
}


def _ascii_words(raw: str) -> frozenset[str]:
    return frozenset(w for w in raw.split() if w.isascii())


#: English ∪ the ASCII subsets of the Latin-script lists — the functional
#: content of the reference's all-language union (see module docstring).
MULTILINGUAL_STOPWORDS: frozenset[str] = ENGLISH_STOPWORDS.union(
    *(_ascii_words(raw) for raw in _LATIN_SCRIPT_LISTS.values())
)


def nltk_stopword_union() -> frozenset[str]:
    """The EXACT reference union — ``nltk.corpus.stopwords.words()`` over
    every downloaded language — when the NLTK corpus is importable.
    Import-guarded: raises ``ImportError``/``LookupError`` where NLTK or
    its data is absent (this sandbox), exactly like ``PypdfBackend``."""
    from nltk.corpus import stopwords  # noqa: F401

    return frozenset(stopwords.words())
