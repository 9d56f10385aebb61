package graft.petro.hpxeos

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.petro.{MineralSpec, Minerals, SiteDef, ValenceSplit}

/** Metabasite (NCKFMASHTO) a-x phases from the published THERMOCALC
  * axfile tc-mb51NCKFMASHTO.txt (Green, White, Diener, Powell, Holland &
  * Palin 2016). Block strings are verbatim axfile data (reference
  * transcription: src/petropandas/hpxeos/metabasite/). */
object Metabasite {

  /** Clinoamphibole 'hb' — the largest model: 11 end members, 6 sites,
    * five caller-supplied variables (z, a, k, Q1, Q2)
    * (reference: hpxeos/metabasite/amphibole.py). */
  object TcAmphibole extends Phase {
    val abbreviation = "hb"
    val sites = Seq(
      "A" -> Seq("Na{+}", "K{+}"),
      "M13" -> Seq("Mg{2+}", "Fe{2+}"),
      "M2" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Fe{3+}", "Ti{4+}"),
      "M4" -> Seq("Ca{2+}", "Mg{2+}", "Fe{2+}", "Na{+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("tr", "tsm", "prgm", "glm", "cumm", "grnm",
      "a", "b", "mrb", "kprg", "tts")
    override val orderParameterNames = Seq("z", "a", "k", "Q1", "Q2")
    val mineral: MineralSpec = Minerals.Amp

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 79-126.
    val pBlock = """
p(tr)      1 1    0  6  -1/2  a   1  c  -1  f  -1  t  -1  y   1  z

p(tsm)     1 1    0  4  -1/2  a   1  f   1  y  -1  z

p(prgm)    2 1    0  1   1  a
             2    0  1  -1  a    0  1  1  k

p(glm)     1 1    0  2  -1  f   1  z

p(cumm)    6 1    1  5  -1  c  -1  Q2  -1  x  -1  z  -3/2  Q1
             2    0  1  1  f    0  1  1  Q2
             2    0  1  1  Q2    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  z

p(grnm)    9 1    0  3   1  x  -2  Q2  -5/2  Q1
             2    0  1  2  f    0  1  1  Q2
             2    0  1  2  Q2    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  2  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  y
             2    0  1  1  x    0  1  1  z

p(a)       6 1    0  2   1  Q2  5/2  Q1
             2    0  1  -1  f    0  1  1  Q2
             2    0  1  -1  Q2    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  z

p(b)       9 1    0  2  2  Q2  3/2  Q1
             2    0  1  -2  f    0  1  1  Q2
             2    0  1  -2  Q2    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -2  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  y
             2    0  1  -1  x    0  1  1  z

p(mrb)     1 1    0  1  1  f

p(kprg)    1 2    0  1  1  a    0  1  1  k

p(tts)     1 1    0  1  1  t
"""

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 196-256.
    override val sfBlock = """
xvA        1 1    1  1  -1  a

xNaA       2 1    0  1   1  a
             2    0  1  -1  a    0  1  1  k

xKA        1 2    0  1  1  a    0  1  1  k

xMgM13     1 1    1  2   1  Q1  -1  x

xFeM13     1 1    0  2  -1  Q1   1  x

xMgM2      7 1    1  5  -1  f   1  Q2  -1  t  -1  x  -1  y
             2    0  1  -1  f    0  1  1  Q2
             2    0  1  -1  Q2    0  1  1  t
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM2      7 1    0  2  -1  Q2   1  x
             2    0  1  1  f    0  1  1  Q2
             2    0  1  1  Q2    0  1  1  t
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  1  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xAlM2      1 1    0  1  1  y

xFe3M2     1 1    0  1  1  f

xTiM2      1 1    0  1  1  t

xCaM4      1 1    0  1  1  c

xMgM4      6 1    1  5  -1  c  -1  Q2  -1  x  -1  z  -3/2  Q1
             2    0  1  1  f    0  1  1  Q2
             2    0  1  1  Q2    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  z

xFeM4      6 1    0  3   1  Q2   1  x  3/2  Q1
             2    0  1  -1  f    0  1  1  Q2
             2    0  1  -1  Q2    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  z

xNaM4      1 1    0  1  1  z

xSiT1      1 1    1  5  -1/2  f  -1/2  t  -1/2  y  1/2  z  -1/4  a

xAlT1      1 1    0  5  1/2  f  1/2  t  1/2  y  -1/2  z  1/4  a

xOHV       1 1    1  1  -1  t

xOV        1 1    0  1  1  t
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val alT1 = lit(8.0) - comp("Si{4+}")
      Seq(
        "Fe" -> comp("Fe{2+}"),
        "Mg" -> comp("Mg{2+}"),
        "Fe3" -> comp("Fe{3+}"),
        "Ti" -> comp("Ti{4+}"),
        "Ca" -> comp("Ca{2+}"),
        "AlM2" -> (comp("Al{3+}") - alT1))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlM2") / 2.0,
      "f" -> sf("Fe3") / 2.0,
      "t" -> sf("Ti") / 2.0,
      "c" -> sf("Ca") / 2.0,
      "z" -> order("z"), "a" -> order("a"), "k" -> order("k"),
      "Q1" -> order("Q1"), "Q2" -> order("Q2"))
  }

  /** Olivine 'ol' — single M site, no order parameter
    * (reference: hpxeos/metabasite/olivine.py). */
  object TcOlivine extends Phase {
    val abbreviation = "ol"
    val sites = Seq("M" -> Seq("Mg{2+}", "Fe{2+}"))
    val endMemberNames = Seq("fo", "fa")
    val mineral: MineralSpec = MineralSpec("TC_ol", 4, Some(3), Nil,
      Seq(
        SiteDef("T", 1.0, Seq("Si{4+}")),
        SiteDef("M", 2.0, Seq("Mg{2+}", "Fe{2+}", "Mn{2+}", "Ca{2+}"))),
      totalRange = (98.0, 101.0))

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 934-936.
    val pBlock = """
p(fo)      1  1    1  1 -1  x
p(fa)      1  1    0  1  1  x
"""
    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 944-946.
    override val sfBlock = """
xMgM    1 1      1  1 -1  x
xFeM    1 1      0  1  1  x
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xMgM" -> comp("Mg{2+}") / siteTotal("M"),
      "xFeM" -> comp("Fe{2+}") / siteTotal("M"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] =
      Seq("x" -> sf("xFeM"))
  }

  /** Peristerite 'abc' — charge-coupled NaSi/CaAl pseudo-site
    * (reference: hpxeos/metabasite/peristerite.py). */
  object TcPeristerite extends Phase {
    val abbreviation = "abc"
    val sites = Seq("A" -> Seq("Na{+}", "Ca{2+}"))
    val endMemberNames = Seq("abm", "anm")
    val mineral: MineralSpec = MineralSpec("TC_abc", 8, None, Nil,
      Seq(
        SiteDef("A", 1.0, Seq("Na{+}", "Ca{2+}")),
        SiteDef("T", 4.0, Seq("Al{3+}", "Si{4+}"))),
      totalRange = (98.5, 101.5))

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 1050-1051.
    val pBlock = """
p(abm)   1 1    1 1 -1 ca
p(anm)   1 1    0 1  1 ca
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xNaA" -> comp("Na{+}") / siteTotal("A"),
      "xCaA" -> comp("Ca{2+}") / siteTotal("A"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] =
      Seq("ca" -> sf("xCaA"))
  }

  /** Plagioclase I-1 'pli' — older single-site ternary feldspar
    * (reference: hpxeos/metabasite/plagioclase_ibar1.py). */
  object TcPlagioclaseIbar1 extends Phase {
    val abbreviation = "pli"
    val sites = Seq("A" -> Seq("Na{+}", "Ca{2+}", "K{+}"))
    val endMemberNames = Seq("abhI", "an", "san")
    val mineral: MineralSpec = MineralSpec("TC_pli", 8, None, Nil,
      Seq(
        SiteDef("A", 1.0, Seq("Na{+}", "Ca{2+}", "K{+}")),
        SiteDef("T", 4.0, Seq("Al{3+}", "Si{4+}"))),
      totalRange = (98.5, 101.5))

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 1302-1304.
    val pBlock = """
p(abhI)  1 1    1 2 -1 k -1 ca
p(an)    1 1    0 1  1 ca
p(san)   1 1    0 1  1 k
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xNa" -> comp("Na{+}") / siteTotal("A"),
      "xCa" -> comp("Ca{2+}") / siteTotal("A"),
      "xK" -> comp("K{+}") / siteTotal("A"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "ca" -> sf("xCa"), "k" -> sf("xK"))
  }

  val phases: Seq[Phase] =
    Seq(TcAmphibole, TcOlivine, TcPeristerite, TcPlagioclaseIbar1)
}
