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

  /** Augite 'aug' — calcic cpx, tet-site order-disorder only (Qfm, Qal)
    * (reference: hpxeos/metabasite/augite.py). */
  object TcAugite extends Phase {
    val abbreviation = "aug"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Fe{3+}"),
      "M2" -> Seq("Mg{2+}", "Fe{2+}", "Ca{2+}", "Na{+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("di", "cenh", "cfs", "jdm", "acmm", "ocats",
      "dcats", "fmc")
    override val orderParameterNames = Seq("Qfm", "Qal")
    val mineral: MineralSpec = MineralSpec("TC_aug", 6, Some(4),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("T", 2.0, Seq("Si{4+}", "Al{3+}")),
        SiteDef("M1", 1.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}", "Mg{2+}", "Fe{2+}")),
        SiteDef("M2", 1.0, Seq("Ca{2+}", "Na{+}", "Mn{2+}", "Fe{2+}", "Mg{2+}"))),
      totalRange = (99.0, 101.0))

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 362-388.
    val pBlock = """
p(di)      1 1    0  2  -1  y   1  z

p(cenh)    5 1    1  4  -1/2  Qfm  -1  j  -1  x  -1  z
             2    0  1  1/2  j    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  1/2  Qfm    0  1  1  z
             2    0  1  1  x    0  1  1  z

p(cfs)     5 1    0  2  -1/2  Qfm   1  x
             2    0  1  1/2  j    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1  x    0  1  1  y
             2    0  1  1/2  Qfm    0  1  1  z

p(jdm)     1 1    0  2  -1  f   1  j

p(acmm)    1 1    0  1  1  f

p(ocats)   1 1    0  1  1  Qal

p(dcats)   1 1    0  2  -1  Qal   1  y

p(fmc)     5 1    0  1   1  Qfm
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  1  x    0  1  1  y
             2    0  1  -1  Qfm    0  1  1  z
             2    0  1  -1  x    0  1  1  z
"""

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 432-470.
    override val sfBlock = """
xMgM1      5 1    1  4  1/2  Qfm  -1  j  -1  x  -1  y
             2    0  1  -1/2  j    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  1  x    0  1  1  y
             2    0  1  -1/2  Qfm    0  1  1  z

xFeM1      5 1    0  2  -1/2  Qfm   1  x
             2    0  1  1/2  j    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1  x    0  1  1  y
             2    0  1  1/2  Qfm    0  1  1  z

xAlM1      1 1    0  3  -1  f   1  j   1  y

xFe3M1     1 1    0  1  1  f

xMgM2      5 1    1  4  -1/2  Qfm  -1  j  -1  x  -1  z
             2    0  1  1/2  j    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  1/2  Qfm    0  1  1  z
             2    0  1  1  x    0  1  1  z

xFeM2      5 1    0  2  1/2  Qfm   1  x
             2    0  1  -1/2  j    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1/2  Qfm    0  1  1  z
             2    0  1  -1  x    0  1  1  z

xCaM2      1 1    0  1  1  z

xNaM2      1 1    0  1  1  j

xSiT1      1 1    1  2  1/2  Qal  -1/2  y

xAlT1      1 1    0  2  -1/2  Qal  1/2  y

xSiT2      1 1    1  2  -1/2  Qal  -1/2  y

xAlT2      1 1    0  2  1/2  Qal  1/2  y
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Fe3" -> comp("Fe{3+}"),
      "Ca" -> comp("Ca{2+}"),
      "Na" -> comp("Na{+}"),
      "AlT" -> (lit(2.0) - comp("Si{4+}")))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlT"),
      "f" -> sf("Fe3"),
      "z" -> sf("Ca"),
      "j" -> sf("Na"),
      "Qfm" -> order("Qfm"), "Qal" -> order("Qal"))
  }

  /** Omphacite 'dio' — sodic-calcic cpx, P2/n ordering sub-sites collapse
    * to combined M1/M2 for mass balance; three order parameters
    * (reference: hpxeos/metabasite/omphacite.py). */
  object TcOmphacite extends Phase {
    val abbreviation = "dio"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Fe{3+}"),
      "M2" -> Seq("Na{+}", "Ca{2+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("jd", "di", "hed", "acmm", "om", "cfm", "jac")
    override val orderParameterNames = Seq("Q", "Qaf", "Qfm")
    val mineral: MineralSpec = TcAugite.mineral.copy(name = "TC_dio")

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 557-582.
    val pBlock = """
p(jd)      2 1    0  3   1  j  -1  Q  -1  Qaf
             2    0  1  -1  f    0  1  1  j

p(di)      5 1    1  4  -1  j  -1  Q   1  Qfm  -1  x
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  -1  Q    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  x

p(hed)     5 1    0  2   1  Qfm   1  x
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  -1  Q    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  x

p(acmm)    2 1    0  1  -1  Qaf
             2    0  1  1  f    0  1  1  j

p(om)      1 1    0  1  2  Q

p(cfm)     4 1    0  1  -2  Qfm
             2    0  1  2  j    0  1  1  Qfm
             2    0  1  2  Q    0  1  1  Qfm
             2    0  1  2  Q    0  1  1  x

p(jac)     1 1    0  1  2  Qaf
"""

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 609-651.
    override val sfBlock = """
xMgM1m     5 1    1  4  -1  j   1  Q   1  Qfm  -1  x
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  -1  Q    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  x

xFeM1m     5 1    0  2  -1  Qfm   1  x
             2    0  1  1  j    0  1  1  Qfm
             2    0  1  1  Q    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  1  Q    0  1  1  x

xFe3M1m    2 1    0  1  -1  Qaf
             2    0  1  1  f    0  1  1  j

xAlM1m     2 1    0  3   1  j  -1  Q   1  Qaf
             2    0  1  -1  f    0  1  1  j

xMgM1a     5 1    1  4  -1  j  -1  Q  -1  Qfm  -1  x
             2    0  1  1  j    0  1  1  Qfm
             2    0  1  1  Q    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  1  Q    0  1  1  x

xFeM1a     5 1    0  2   1  Qfm   1  x
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  -1  Q    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  x

xFe3M1a    2 1    0  1   1  Qaf
             2    0  1  1  f    0  1  1  j

xAlM1a     2 1    0  3   1  j   1  Q  -1  Qaf
             2    0  1  -1  f    0  1  1  j

xNaM2c     1 1    0  2   1  j  -1  Q

xCaM2c     1 1    1  2  -1  j   1  Q

xNaM2n     1 1    0  2   1  j   1  Q

xCaM2n     1 1    1  2  -1  j  -1  Q
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Al" -> comp("Al{3+}"),
      "Fe3" -> comp("Fe{3+}"),
      "Na" -> comp("Na{+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "f" -> sf("Fe3") / (sf("Al") + sf("Fe3")),
      "j" -> sf("Na"),
      "Q" -> order("Q"), "Qaf" -> order("Qaf"), "Qfm" -> order("Qfm"))
  }

  /** Garnet 'g' — Mn-free core of the metapelite garnet
    * (reference: hpxeos/metabasite/garnet.py). */
  object TcGarnet extends Phase {
    val abbreviation = "g"
    val sites = Seq(
      "X" -> Seq("Mg{2+}", "Fe{2+}", "Ca{2+}"),
      "Y" -> Seq("Al{3+}", "Fe{3+}"))
    val endMemberNames = Seq("py", "alm", "gr", "kho")
    val mineral: MineralSpec = MineralSpec("TC_g_mb", 12, Some(8),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("Z", 3.0, Seq("Si{4+}", "Al{3+}")),
        SiteDef("Y", 2.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}")),
        SiteDef("X", 3.0, Seq("Fe{2+}", "Mg{2+}", "Ca{2+}"))),
      totalRange = (99.0, 101.0))

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 855-863.
    val pBlock = """
p(py)      2 1    1  3  -1  f  -1  x  -1  z
             2    0  1  1  x    0  1  1  z

p(alm)     2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  z

p(gr)      1 1    0  1  1  z

p(kho)     1 1    0  1  1  f
"""
    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 880-890.
    override val sfBlock = """
xMgX       2 1    1  2  -1  x  -1  z
             2    0  1  1  x    0  1  1  z

xFeX       2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  z

xCaX       1 1    0  1  1  z

xAlY       1 1    1  1  -1  f

xFe3Y      1 1    0  1  1  f
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xMgX" -> comp("Mg{2+}") / siteTotal("X"),
      "xFeX" -> comp("Fe{2+}") / siteTotal("X"),
      "xCaX" -> comp("Ca{2+}") / siteTotal("X"),
      "xAlY" -> comp("Al{3+}") / siteTotal("Y"),
      "xFe3Y" -> comp("Fe{3+}") / siteTotal("Y"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("xFeX") / (sf("xFeX") + sf("xMgX")),
      "z" -> sf("xCaX"),
      "f" -> sf("xFe3Y"))
  }

  /** Biotite 'bi' — Mn-free core of the metapelite biotite
    * (reference: hpxeos/metabasite/biotite.py). */
  object TcBiotite extends Phase {
    val abbreviation = "bi"
    val sites = Seq(
      "M3" -> Seq("Mg{2+}", "Fe{2+}", "Fe{3+}", "Ti{4+}", "Al{3+}"),
      "M12" -> Seq("Mg{2+}", "Fe{2+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("phl", "annm", "obi", "east", "tbi", "fbi")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = Metapelite.TcBiotite.mineral.copy(name = "TC_bi_mb")

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 1675-1691.
    val pBlock = """
p(phl)     4 1    1  5  -1  f  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y

p(annm)    1 1    0  2  -1/3  Q   1  x

p(obi)     4 1    0  1   1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y

p(east)    1 1    0  1  1  y

p(tbi)     1 1    0  1  1  t

p(fbi)     1 1    0  1  1  f
"""
    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 1715-1741.
    override val sfBlock = """
xMgM3      4 1    1  5  -1  f  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y

xFeM3      4 1    0  2   1  x  2/3  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xFe3M3     1 1    0  1  1  f

xTiM3      1 1    0  1  1  t

xAlM3      1 1    0  1  1  y

xMgM12     1 1    1  2  1/3  Q  -1  x

xFeM12     1 1    0  2  -1/3  Q   1  x

xSiT       1 1    1/2  2  -1/2  f  -1/2  y

xAlT       1 1    1/2  2  1/2  f  1/2  y
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val alT = lit(4.0) - comp("Si{4+}")
      Seq(
        "Fe" -> comp("Fe{2+}"),
        "Mg" -> comp("Mg{2+}"),
        "Ti" -> comp("Ti{4+}"),
        "Fe3" -> comp("Fe{3+}"),
        "AlOct" -> (comp("Al{3+}") - alT))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlOct"),
      "f" -> sf("Fe3"),
      "t" -> sf("Ti"),
      "Q" -> order("Q"))
  }

  /** Muscovite 'mu' — numerically identical to the metapelite model; only
    * the Ca end-member is relabeled mam (reference:
    * hpxeos/metabasite/muscovite.py). */
  object TcMuscovite extends Metapelite.DioctahedralMica {
    val abbreviation = "mu"
    val endMemberNames = Seq("mu", "cel", "fcel", "pa", "mam", "fmu")
    val mineral: MineralSpec = Metapelite.muMineral.copy(name = "TC_mu_mb")

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 1814-1826.
    val pBlock = """
p(mu)      1 1    0  4  -1  c  -1  f  -1  n   1  y

p(cel)     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y

p(fcel)    2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y

p(pa)      1 1    0  1  1  n

p(mam)      1 1    0  1  1  c

p(fmu)     1 1    0  1  1  f
"""
  }

  /** Chlorite 'chl' — Mn-free core of the metapelite chlorite, same
    * 28-charge APFU basis and QAl/Q1/Q4 order parameters
    * (reference: hpxeos/metabasite/chlorite.py). */
  object TcChlorite extends Phase {
    val abbreviation = "chl"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}"),
      "M23" -> Seq("Mg{2+}", "Fe{2+}"),
      "M4" -> Seq("Mg{2+}", "Fe{2+}", "Fe{3+}", "Al{3+}"),
      "T2" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("clin", "afchl", "ames", "daph", "ochl1",
      "ochl4", "f3clin")
    override val orderParameterNames = Seq("QAl", "Q1", "Q4")
    val mineral: MineralSpec = MineralSpec("TC_chl_mb", 14, None, Nil,
      Seq(
        SiteDef("T", 4.0, Seq("Si{4+}", "Al{3+}")),
        SiteDef("M", 6.0, Seq("Mg{2+}", "Fe{2+}", "Al{3+}"))),
      totalRange = (85.0, 90.0), chargeBasis = Some(28.0))

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 1944-1993.
    val pBlock = """
p(clin)    9 1    0  3  -1/4  Q1  2  QAl  -5/4  Q4
             2    0  1  5/4  f    0  1  1  Q4
             2    0  1  -1/4  Q1    0  1  1  QAl
             2    0  1  5/4  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  1/4  Q1    0  1  1  y
             2    0  1  5/4  Q4    0  1  1  y
             2    0  1  -1  x    0  1  1  y

p(afchl)   9 1    1  6  -1  f  -1  QAl  -1  y  -2  x  5/4  Q1  9/4  Q4
             2    0  1  -9/4  f    0  1  1  Q4
             2    0  1  5/4  Q1    0  1  1  QAl
             2    0  1  -9/4  Q4    0  1  1  QAl
             2    0  1  2  f    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  -5/4  Q1    0  1  1  y
             2    0  1  -9/4  Q4    0  1  1  y
             2    0  1  3  x    0  1  1  y

p(ames)    1 1    0  2  -1  QAl   1  y

p(daph)    9 1    0  2  1/4  Q1  5/4  Q4
             2    0  1  -5/4  f    0  1  1  Q4
             2    0  1  1/4  Q1    0  1  1  QAl
             2    0  1  -5/4  Q4    0  1  1  QAl
             2    0  1  1  f    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  -1/4  Q1    0  1  1  y
             2    0  1  -5/4  Q4    0  1  1  y
             2    0  1  1  x    0  1  1  y

p(ochl1)   7 1    0  2  -1  Q4   1  x
             2    0  1  1  f    0  1  1  Q4
             2    0  1  1  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  1  Q4    0  1  1  y
             2    0  1  -1  x    0  1  1  y

p(ochl4)   8 1    0  3   1  x  -5/4  Q1  -5/4  Q4
             2    0  1  5/4  f    0  1  1  Q4
             2    0  1  -5/4  Q1    0  1  1  QAl
             2    0  1  5/4  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  5/4  Q1    0  1  1  y
             2    0  1  5/4  Q4    0  1  1  y
             2    0  1  -2  x    0  1  1  y

p(f3clin)   1 1    0  1  1  f
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val alT2 = lit(4.0) - comp("Si{4+}")
      Seq(
        "Fe" -> comp("Fe{2+}"),
        "Mg" -> comp("Mg{2+}"),
        "Fe3" -> comp("Fe{3+}"),
        "AlOct" -> (comp("Al{3+}") - alT2))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlOct") / 2.0,
      "f" -> sf("Fe3"),
      "QAl" -> order("QAl"), "Q1" -> order("Q1"), "Q4" -> order("Q4"))
  }

  /** Orthopyroxene 'opx' — Mn-free core of the metapelite opx
    * (reference: hpxeos/metabasite/orthopyroxene.py). */
  object TcOrthopyroxene extends Phase {
    val abbreviation = "opx"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}", "Fe{3+}", "Al{3+}"),
      "M2" -> Seq("Mg{2+}", "Fe{2+}", "Ca{2+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("en", "fs", "fm", "mgts", "fopx", "odi")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec =
      Metapelite.TcOrthopyroxene.mineral.copy(name = "TC_opx_mb")

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 718-737.
    val pBlock = """
p(en)      3 1    1  5  -1/2  Q  -1  c  -1  f  -1  x  -1  y
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1  c    0  1  1  x

p(fs)      4 1    0  2  -1/2  Q   1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  x    0  1  1  y

p(fm)      5 1    0  1   1  Q
             2    0  1  -1  c    0  1  1  Q
             2    0  1  -1  c    0  1  1  x
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y

p(mgts)    1 1    0  1  1  y

p(fopx)    1 1    0  1  1  f

p(odi)     1 1    0  1  1  c
"""
    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 767-793.
    override val sfBlock = """
xMgM1      4 1    1  4  1/2  Q  -1  f  -1  x  -1  y
             2    0  1  -1/2  c    0  1  1  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y

xFeM1      4 1    0  2  -1/2  Q   1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xFe3M1     1 1    0  1  1  f

xAlM1      1 1    0  1  1  y

xMgM2      3 1    1  3  -1/2  Q  -1  c  -1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1  c    0  1  1  x

xFeM2      3 1    0  2  1/2  Q   1  x
             2    0  1  -1/2  c    0  1  1  Q
             2    0  1  -1  c    0  1  1  x

xCaM2      1 1    0  1  1  c

xAlT       1 1    0  2  1/2  f  1/2  y

xSiT       1 1    1  2  -1/2  f  -1/2  y
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val alT = lit(2.0) - comp("Si{4+}")
      Seq(
        "Fe" -> comp("Fe{2+}"),
        "Mg" -> comp("Mg{2+}"),
        "Ca" -> comp("Ca{2+}"),
        "Fe3" -> comp("Fe{3+}"),
        "AlOct" -> (comp("Al{3+}") - alT))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlOct"),
      "f" -> sf("Fe3"),
      "c" -> sf("Ca"),
      "Q" -> order("Q"))
  }

  /** Mixed ilmenite 'ilmm' — Mn-free core of the metapelite ilmm
    * (reference: hpxeos/metabasite/ilmenite_mixed.py). */
  object TcIlmeniteMixed extends Phase {
    val abbreviation = "ilmm"
    val sites = Seq(
      "A" -> Seq("Fe{2+}", "Ti{4+}", "Mg{2+}", "Fe{3+}"),
      "B" -> Seq("Fe{2+}", "Ti{4+}", "Fe{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("oilm", "dilm", "dhem", "geik")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_ilmm_mb", 3, Some(2), Nil,
      Seq(
        SiteDef("A", 1.0, Seq("Fe{2+}", "Ti{4+}", "Mg{2+}", "Mn{2+}", "Fe{3+}")),
        SiteDef("B", 1.0, Seq("Fe{2+}", "Ti{4+}", "Fe{3+}"))),
      totalRange = (99.0, 101.0))

    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 1534-1540.
    val pBlock = """
p(oilm)    1 1    0  1  1  Q

p(dilm)    1 1    0  3  -1  g   1  i  -1  Q

p(dhem)    1 1    1  1  -1  i

p(geik)    1 1    0  1  1  g
"""
    // Verbatim from tc-mb51NCKFMASHTO.txt, lines 1553-1565.
    override val sfBlock = """
xFeA       1 1    0  3  -1/2  g  1/2  i  1/2  Q

xTiA       1 1    0  3  -1/2  g  1/2  i  -1/2  Q

xMgA       1 1    0  1  1  g

xFe3A      1 1    1  1  -1  i

xFeB       1 1    0  3  -1/2  g  1/2  i  -1/2  Q

xTiB       1 1    0  3  1/2  g  1/2  i  1/2  Q

xFe3B      1 1    1  1  -1  i
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Mg" -> comp("Mg{2+}"),
      "Fe3" -> comp("Fe{3+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "i" -> (lit(1.0) - sf("Fe3") / 2.0),
      "g" -> sf("Mg"),
      "Q" -> order("Q"))
  }

  val phases: Seq[Phase] =
    Seq(TcAmphibole, TcOlivine, TcPeristerite, TcPlagioclaseIbar1,
      TcAugite, TcOmphacite, TcGarnet, TcBiotite, TcMuscovite, TcChlorite,
      TcOrthopyroxene, TcIlmeniteMixed)
}
