package graft.petro.hpxeos

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.petro.{MineralSpec, Minerals, SiteDef, ValenceSplit}

/** Metapelite (MnNCKFMASHTO) a-x phases from the published THERMOCALC
  * axfile tc-mp51MnNCKFMASHTO.txt (White, Powell, Holland, Johnson &
  * Green 2014 + Mn addition, White, Powell & Johnson 2014). Block
  * strings are verbatim axfile data (reference transcription:
  * src/petropandas/hpxeos/metapelite/). */
object Metapelite {

  /** Garnet 'g' — X3Y2Si3O12 (reference: hpxeos/metapelite/garnet.py). */
  object TcGarnet extends Phase {
    val abbreviation = "g"
    val sites = Seq(
      "X" -> Seq("Mg{2+}", "Fe{2+}", "Mn{2+}", "Ca{2+}"),
      "Y" -> Seq("Al{3+}", "Fe{3+}"))
    val endMemberNames = Seq("py", "alm", "spss", "gr", "kho")
    val mineral: MineralSpec = Minerals.Grt

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 58-69.
    val pBlock = """
p(py)      3 1    1  4  -1  f  -1  m  -1  x  -1  z
             2    0  1  1  m    0  1  1  x
             2    0  1  1  x    0  1  1  z

p(alm)     3 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x
             2    0  1  -1  x    0  1  1  z

p(spss)    1 1    0  1  1  m

p(gr)      1 1    0  1  1  z

p(kho)     1 1    0  1  1  f
"""

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 92-106.
    override val sfBlock = """
xMgX       3 1    1  3  -1  m  -1  x  -1  z
             2    0  1  1  m    0  1  1  x
             2    0  1  1  x    0  1  1  z

xFeX       3 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x
             2    0  1  -1  x    0  1  1  z

xMnX       1 1    0  1  1  m

xCaX       1 1    0  1  1  z

xAlY       1 1    1  1  -1  f

xFe3Y      1 1    0  1  1  f
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xMgX" -> comp("Mg{2+}") / siteTotal("X"),
      "xFeX" -> comp("Fe{2+}") / siteTotal("X"),
      "xMnX" -> comp("Mn{2+}") / siteTotal("X"),
      "xCaX" -> comp("Ca{2+}") / siteTotal("X"),
      "xAlY" -> comp("Al{3+}") / siteTotal("Y"),
      "xFe3Y" -> comp("Fe{3+}") / siteTotal("Y"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("xFeX") / (sf("xFeX") + sf("xMgX")),
      "z" -> sf("xCaX"),
      "m" -> sf("xMnX"),
      "f" -> sf("xFe3Y"))
  }

  /** Biotite 'bi' — M3 M12_2 T_2 with order parameter Q
    * (reference: hpxeos/metapelite/biotite.py). */
  object TcBiotite extends Phase {
    val abbreviation = "bi"
    val sites = Seq(
      "M3" -> Seq("Mg{2+}", "Mn{2+}", "Fe{2+}", "Fe{3+}", "Ti{4+}", "Al{3+}"),
      "M12" -> Seq("Mg{2+}", "Mn{2+}", "Fe{2+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("phl", "annm", "obi", "east", "tbi", "fbi", "mmbi")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_bi", 11, None, Nil,
      Seq(
        SiteDef("T", 4.0, Seq("Si{4+}", "Al{3+}")),
        SiteDef("I", 1.0, Seq("K{+}", "Na{+}")),
        SiteDef("O", 3.0, Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Ti{4+}", "Mn{2+}"))),
      totalRange = (94.0, 97.0))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 733-753.
    val pBlock = """
p(phl)     5 1    1  6  -1  f  -1  m  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  3  m    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y

p(annm)    1 1    0  2  -1/3  Q   1  x

p(obi)     5 1    0  1   1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -3  m    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y

p(east)    1 1    0  1  1  y

p(tbi)     1 1    0  1  1  t

p(fbi)     1 1    0  1  1  f

p(mmbi)    1 1    0  1  1  m
"""

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 783-813.
    override val sfBlock = """
xMgM3      5 1    1  6  -1  f  -1  m  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  3  m    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y

xMnM3      1 1    0  1  1  m

xFeM3      5 1    0  2   1  x  2/3  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -3  m    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xFe3M3     1 1    0  1  1  f

xTiM3      1 1    0  1  1  t

xAlM3      1 1    0  1  1  y

xMgM12     1 1    1  3  1/3  Q  -1  m  -1  x

xMnM12     1 1    0  1  1  m

xFeM12     1 1    0  2  -1/3  Q   1  x

xSiT       1 1    1/2  2  -1/2  f  -1/2  y

xAlT       1 1    1/2  2  1/2  f  1/2  y
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val alT = lit(4.0) - comp("Si{4+}")
      Seq(
        "Fe" -> comp("Fe{2+}"),
        "Mg" -> comp("Mg{2+}"),
        "Mn" -> comp("Mn{2+}"),
        "Ti" -> comp("Ti{4+}"),
        "Fe3" -> comp("Fe{3+}"),
        "AlOct" -> (comp("Al{3+}") - alT))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "m" -> sf("Mn") / 3.0,
      "y" -> sf("AlOct"),
      "f" -> sf("Fe3"),
      "t" -> sf("Ti"),
      "Q" -> order("Q"))
  }

  /** Plagioclase 'pl4tr' — Holland, Green & Powell (2021) 4TR ternary
    * feldspar, plagioclase parameterisation
    * (reference: hpxeos/metapelite/plagioclase.py). */
  object TcPl4tr extends Phase {
    val abbreviation = "pl4tr"
    val sites = Seq(
      "A" -> Seq("Na{+}", "Ca{2+}", "K{+}"),
      "TB" -> Seq("Al{3+}", "Si{4+}"))
    val endMemberNames = Seq("ab", "an", "san")
    val mineral: MineralSpec = MineralSpec("TC_pl4tr", 8, None, Nil,
      Seq(
        SiteDef("A", 1.0, Seq("Na{+}", "Ca{2+}", "K{+}")),
        SiteDef("T", 4.0, Seq("Al{3+}", "Si{4+}"))),
      totalRange = (98.5, 101.5))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 159-161.
    val pBlock = """
p(ab)   1 1    1 2 -1 k -1 ca
p(an)   1 1    0 1  1 ca
p(san)  1 1    0 1  1 k
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 175-179.
    override val sfBlock = """
xNaA       1 1    1  2  -1  ca  -1  k
xCaA       1 1    0  1  1  ca
xKA        1 1    0  1  1  k
xAlTB      1 1    1/4  1  1/4  ca
xSiTB      1 1    3/4  1  -1/4  ca
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xNaA" -> comp("Na{+}") / siteTotal("A"),
      "xCaA" -> comp("Ca{2+}") / siteTotal("A"),
      "xKA" -> comp("K{+}") / siteTotal("A"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "ca" -> sf("xCaA"), "k" -> sf("xKA"))
  }

  /** K-feldspar 'k4tr' — same model, K-feldspar parameterisation
    * (reference: hpxeos/metapelite/kfeldspar.py). */
  object TcK4tr extends Phase {
    val abbreviation = "k4tr"
    val sites = TcPl4tr.sites
    val endMemberNames = Seq("ab", "an", "san")
    val mineral: MineralSpec = TcPl4tr.mineral.copy(name = "TC_k4tr")

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 221-223.
    val pBlock = """
p(ab)   1 1    0 1  1 na
p(an)   1 1    0 1  1 ca
p(san)  1 1    1 2 -1 na -1 ca
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 237-241.
    override val sfBlock = """
xNaA       1 1    0 1  1 na
xCaA       1 1    0 1  1 ca
xKA        1 1    1 2 -1 na -1 ca
xAlTB      1 1    1/4  1  1/4  ca
xSiTB      1 1    3/4  1  -1/4  ca
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] =
      TcPl4tr.siteFractions(comp, siteTotal)

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "na" -> sf("xNaA"), "ca" -> sf("xCaA"))
  }

  /** Chloritoid 'ctd' (reference: hpxeos/metapelite/chloritoid.py). */
  object TcChloritoid extends Phase {
    val abbreviation = "ctd"
    val sites = Seq(
      "M1A" -> Seq("Al{3+}", "Fe{3+}"),
      "M1B" -> Seq("Fe{2+}", "Mg{2+}", "Mn{2+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("mctd", "fctd", "mnct", "ctdo")
    val mineral: MineralSpec = MineralSpec("TC_ctd", 8, Some(2),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("M1A", 1.0, Seq("Al{3+}", "Fe{3+}")),
        SiteDef("M1B", 1.0, Seq("Fe{2+}", "Mg{2+}", "Mn{2+}"))),
      totalRange = (97.0, 101.0))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1619-1627.
    val pBlock = """
p(mctd)    2 1    1  3  -1  f  -1  m  -1  x
             2    0  1  1  m    0  1  1  x

p(fctd)    2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x

p(mnct)    1 1    0  1  1  m

p(ctdo)    1 1    0  1  1  f
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1640-1650.
    override val sfBlock = """
xAlM1A     1 1    1  1  -1  f

xFe3M1A    1 1    0  1  1  f

xFeM1B     2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x

xMgM1B     2 1    1  2  -1  m  -1  x
             2    0  1  1  m    0  1  1  x

xMnM1B     1 1    0  1  1  m
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val m1b = comp("Fe{2+}") + comp("Mg{2+}") + comp("Mn{2+}")
      Seq(
        "xFeM1B" -> comp("Fe{2+}") / m1b,
        "xMgM1B" -> comp("Mg{2+}") / m1b,
        "xMnM1B" -> comp("Mn{2+}") / m1b,
        "Fe3" -> comp("Fe{3+}"))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("xFeM1B") / (sf("xFeM1B") + sf("xMgM1B")),
      "m" -> sf("xMnM1B"),
      "f" -> sf("Fe3") / 0.5)
  }

  /** Staurolite 'st' — Y site with genuine structural vacancy
    * (reference: hpxeos/metapelite/staurolite.py). */
  object TcStaurolite extends Phase {
    val abbreviation = "st"
    val sites = Seq(
      "X" -> Seq("Mg{2+}", "Fe{2+}", "Mn{2+}"),
      "Y" -> Seq("Al{3+}", "Fe{3+}", "Ti{4+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("mstm", "fst", "mnstm", "msto", "mstt")
    val mineral: MineralSpec = MineralSpec("TC_st", 48, Some(6),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("X", 4.0, Seq("Mg{2+}", "Fe{2+}", "Mn{2+}")),
        SiteDef("Y", 2.0, Seq("Al{3+}", "Fe{3+}", "Ti{4+}"))),
      totalRange = (99.0, 101.0))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1269-1279.
    val pBlock = """
p(mstm)    2 1    1  4  -1  f  -1  m  -1  x  -4/3  t
             2    0  1  1  m    0  1  1  x

p(fst)     2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x

p(mnstm)   1 1    0  1  1  m

p(msto)    1 1    0  1  1  f

p(mstt)    1 1    0  1  4/3  t
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1296-1310.
    override val sfBlock = """
xMgX       2 1    1  2  -1  m  -1  x
             2    0  1  1  m    0  1  1  x

xFeX       2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x

xMnX       1 1    0  1  1  m

xAlY       1 1    1  2  -1  f  -4/3  t

xFe3Y      1 1    0  1  1  f

xTiY       1 1    0  1  1  t

xvY        1 1    0  1  1/3  t
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val xTotal = comp("Mg{2+}") + comp("Fe{2+}") + comp("Mn{2+}")
      Seq(
        "xFeX" -> comp("Fe{2+}") / xTotal,
        "xMgX" -> comp("Mg{2+}") / xTotal,
        "xMnX" -> comp("Mn{2+}") / xTotal,
        "Fe3" -> comp("Fe{3+}"),
        "Ti" -> comp("Ti{4+}"))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("xFeX") / (sf("xFeX") + sf("xMgX")),
      "m" -> sf("xMnX"),
      "f" -> sf("Fe3") / 2.0,
      "t" -> sf("Ti") / 2.0)
  }

  /** Cordierite 'cd' — channel H2O supplied as order parameter `h`
    * (reference: hpxeos/metapelite/cordierite.py). */
  object TcCordierite extends Phase {
    val abbreviation = "cd"
    val sites = Seq("X" -> Seq("Fe{2+}", "Mg{2+}", "Mn{2+}"))
    val endMemberNames = Seq("crd", "fcrd", "hcrd", "mncd")
    override val orderParameterNames = Seq("h")
    val mineral: MineralSpec = MineralSpec("TC_cd", 18, None, Nil,
      Seq(SiteDef("X", 2.0, Seq("Fe{2+}", "Mg{2+}", "Mn{2+}"))),
      totalRange = (97.0, 101.0))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1182-1190.
    val pBlock = """
p(crd)      2 1    1  3  -1  h  -1  m  -1  x
              2    0  1  1  m    0  1  1  x

p(fcrd)     2 1    0  1   1  x
              2    0  1  -1  m    0  1  1  x

p(hcrd)     1 1    0  1  1  h

p(mncd)     1 1    0  1  1  m
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1203-1213.
    override val sfBlock = """
xFeX       2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x

xMgX       2 1    1  2  -1  m  -1  x
             2    0  1  1  m    0  1  1  x

xMnX       1 1    0  1  1  m

xH2OH      1 1    0  1  1  h

xvH        1 1    1  1  -1  h
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xFeX" -> comp("Fe{2+}") / siteTotal("X"),
      "xMgX" -> comp("Mg{2+}") / siteTotal("X"),
      "xMnX" -> comp("Mn{2+}") / siteTotal("X"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("xFeX") / (sf("xFeX") + sf("xMgX")),
      "m" -> sf("xMnX"),
      "h" -> order("h"))
  }

  /** Shared K-white-mica site model: A(K,Na,Ca) M2A(Mg,Fe,Al) M2B(Al,Fe3+)
    * T1_2(Si,Al); x,y,f,n,c by mass balance
    * (reference: hpxeos/dioctahedral_mica.py). */
  trait DioctahedralMica extends Phase {
    val sites = Seq(
      "A" -> Seq("K{+}", "Na{+}", "Ca{2+}"),
      "M2A" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}"),
      "M2B" -> Seq("Al{3+}", "Fe{3+}"),
      "T1" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Na" -> comp("Na{+}"),
      "Ca" -> comp("Ca{2+}"),
      "ATotal" -> (comp("K{+}") + comp("Na{+}") + comp("Ca{2+}")),
      "AlT1" -> (lit(4.0) - comp("Si{4+}")),
      "Fe3" -> comp("Fe{3+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> (sf("AlT1") - sf("Ca") / sf("ATotal")),
      "f" -> sf("Fe3"),
      "n" -> sf("Na") / sf("ATotal"),
      "c" -> sf("Ca") / sf("ATotal"))
  }

  private[hpxeos] val muMineral = MineralSpec("TC_mu", 13, Some(5),
    Seq(ValenceSplit("Fe", "droop")),
    Seq(
      SiteDef("A", 1.0, Seq("K{+}", "Na{+}", "Ca{2+}")),
      SiteDef("M2A", 1.0, Seq("Mg{2+}", "Fe{2+}", "Al{3+}")),
      SiteDef("M2B", 1.0, Seq("Al{3+}", "Fe{3+}")),
      SiteDef("T1", 2.0, Seq("Si{4+}", "Al{3+}"))),
    totalRange = (96.0, 101.0))

  /** Muscovite 'mu' (reference: hpxeos/metapelite/muscovite.py). */
  object TcMuscovite extends DioctahedralMica {
    val abbreviation = "mu"
    val endMemberNames = Seq("mu", "cel", "fcel", "pa", "mat", "fmu")
    val mineral: MineralSpec = muMineral

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 592-604.
    val pBlock = """
p(mu)      1 1    0  4  -1  c  -1  f  -1  n   1  y

p(cel)     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y

p(fcel)    2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y

p(pa)      1 1    0  1  1  n

p(mat)      1 1    0  1  1  c

p(fmu)     1 1    0  1  1  f
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 641-655.
    override val sfBlock = """
xKA        1 1    1  2  -1  c  -1  n

xNaA       1 1    0  1  1  n

xCaA       1 1    0  1  1  c

xMgM2A     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y

xFeM2A     2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y

xAlM2A     1 1    0  1  1  y

xAlM2B     1 1    1  1  -1  f

xFe3M2B    1 1    0  1  1  f

xSiT1      1 1    1  2  -1/2  c  -1/2  y

xAlT1      1 1    0  2  1/2  c  1/2  y
"""
  }

  /** Margarite 'ma' — Ca-dominant relabeling of the same mica model
    * (reference: hpxeos/metapelite/margarite.py). */
  object TcMargarite extends DioctahedralMica {
    val abbreviation = "ma"
    val endMemberNames = Seq("mut", "celt", "fcelt", "pat", "ma", "fmu")
    val mineral: MineralSpec = muMineral.copy(name = "TC_ma")

    // Verbatim from tc-mp51MnNCKFMASHTO.txt (margarite block).
    val pBlock = """
p(mut)      1 1    0  4  -1  c  -1  f  -1  n   1  y
p(celt)     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y
p(fcelt)    2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y
p(pat)      1 1    0  1  1  n
p(ma)      1 1    0  1  1  c
p(fmu)     1 1    0  1  1  f
"""
  }

  /** Chlorite 'chl' — 28-charge APFU basis with QAl/Q1/Q4 order
    * parameters (reference: hpxeos/metapelite/chlorite.py). */
  object TcChlorite extends Phase {
    val abbreviation = "chl"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Mn{2+}", "Fe{2+}", "Al{3+}"),
      "M23" -> Seq("Mg{2+}", "Mn{2+}", "Fe{2+}"),
      "M4" -> Seq("Mg{2+}", "Fe{2+}", "Fe{3+}", "Al{3+}"),
      "T2" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("clin", "afchl", "ames", "daph", "ochl1",
      "ochl4", "f3clin", "mmchl")
    override val orderParameterNames = Seq("QAl", "Q1", "Q4")
    val mineral: MineralSpec = MineralSpec("TC_chl", 14, None, Nil,
      Seq(
        SiteDef("T", 4.0, Seq("Si{4+}", "Al{3+}")),
        SiteDef("M", 6.0, Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Mn{2+}"))),
      totalRange = (85.0, 90.0), chargeBasis = Some(28.0))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1389-1446.
    val pBlock = """
p(clin)    11 1    0  4  -1/4  Q1  -1  m  2  QAl  -5/4  Q4
             2    0  1  1/4  m    0  1  1  Q1
             2    0  1  5/4  f    0  1  1  Q4
             2    0  1  -1/4  Q1    0  1  1  QAl
             2    0  1  5/4  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  1  m    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  1/4  Q1    0  1  1  y
             2    0  1  5/4  Q4    0  1  1  y
             2    0  1  -1  x    0  1  1  y

p(afchl)   10 1    1  6  -1  f  -1  QAl  -1  y  -2  x  5/4  Q1  9/4  Q4
             2    0  1  -5/4  m    0  1  1  Q1
             2    0  1  -9/4  f    0  1  1  Q4
             2    0  1  5/4  Q1    0  1  1  QAl
             2    0  1  -9/4  Q4    0  1  1  QAl
             2    0  1  2  f    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  -5/4  Q1    0  1  1  y
             2    0  1  -9/4  Q4    0  1  1  y
             2    0  1  3  x    0  1  1  y

p(ames)    1 1    0  2  -1  QAl   1  y

p(daph)    11 1    0  2  1/4  Q1  5/4  Q4
             2    0  1  -1/4  m    0  1  1  Q1
             2    0  1  -5/4  f    0  1  1  Q4
             2    0  1  1/4  Q1    0  1  1  QAl
             2    0  1  -5/4  Q4    0  1  1  QAl
             2    0  1  1  f    0  1  1  x
             2    0  1  -1  m    0  1  1  x
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

p(ochl4)   9 1    0  3   1  x  -5/4  Q1  -5/4  Q4
             2    0  1  5/4  m    0  1  1  Q1
             2    0  1  5/4  f    0  1  1  Q4
             2    0  1  -5/4  Q1    0  1  1  QAl
             2    0  1  5/4  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  5/4  Q1    0  1  1  y
             2    0  1  5/4  Q4    0  1  1  y
             2    0  1  -2  x    0  1  1  y

p(f3clin)   1 1    0  1  1  f

p(mmchl)   1 1    0  1  1  m
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val alT2 = lit(4.0) - comp("Si{4+}")
      Seq(
        "Fe" -> comp("Fe{2+}"),
        "Mg" -> comp("Mg{2+}"),
        "Mn" -> comp("Mn{2+}"),
        "Fe3" -> comp("Fe{3+}"),
        "AlOct" -> (comp("Al{3+}") - alT2))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlOct") / 2.0,
      "f" -> sf("Fe3"),
      "m" -> sf("Mn") / 5.0,
      "QAl" -> order("QAl"), "Q1" -> order("Q1"), "Q4" -> order("Q4"))
  }

  /** Epidote 'ep' — Holland & Powell (2011), M1/M3 Fe3+ ordering with
    * order parameter Q (reference: hpxeos/metapelite/epidote.py). */
  object TcEpidote extends Phase {
    val abbreviation = "ep"
    val sites = Seq(
      "M1" -> Seq("Al{3+}", "Fe{3+}"),
      "M3" -> Seq("Al{3+}", "Fe{3+}"))
    val endMemberNames = Seq("cz", "ep", "fep")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_ep", 12.5, None, Nil,
      Seq(
        SiteDef("M1", 1.0, Seq("Al{3+}", "Fe{3+}")),
        SiteDef("M3", 1.0, Seq("Al{3+}", "Fe{3+}"))),
      totalRange = (98.0, 102.0), preprocess = graft.petro.Convert.feoToFe2o3)

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 414-417.
    val pBlock = """
p(cz)    1  1    1  2 -1  f  -1  Q
p(ep)    1  1    0  1  2  Q
p(fep)   1  1    0  2  1  f  -1  Q
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 425-428.
    override val sfBlock = """
xFeM1   1  1    0  2  1  f  -1  Q
xAlM1   1  1    1  2 -1  f   1  Q
xFeM3   1  1    0  2  1  f   1  Q
xAlM3   1  1    1  2 -1  f  -1  Q
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] =
      Seq("Fe3" -> comp("Fe{3+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "f" -> sf("Fe3") / 2.0, "Q" -> order("Q"))
  }

  /** Orthopyroxene 'opx' — M1/M2/T with order parameter Q
    * (reference: hpxeos/metapelite/orthopyroxene.py). */
  object TcOrthopyroxene extends Phase {
    val abbreviation = "opx"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}", "Mn{2+}", "Fe{3+}", "Al{3+}"),
      "M2" -> Seq("Mg{2+}", "Fe{2+}", "Mn{2+}", "Ca{2+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("en", "fs", "fm", "mgts", "fopx", "mnopx", "odi")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_opx", 6, Some(4),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("T", 2.0, Seq("Si{4+}", "Al{3+}")),
        SiteDef("M1", 1.0, Seq("Al{3+}", "Fe{3+}", "Mg{2+}", "Fe{2+}", "Mn{2+}")),
        SiteDef("M2", 1.0, Seq("Mg{2+}", "Fe{2+}", "Mn{2+}", "Ca{2+}"))),
      totalRange = (99.0, 101.0))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 902-928.
    val pBlock = """
p(en)      5 1    1  6  -1/2  Q  -1  c  -1  f  -1  m  -1  x  -1  y
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1/2  m    0  1  1  Q
             2    0  1  1  c    0  1  1  x
             2    0  1  1  m    0  1  1  x

p(fs)      6 1    0  2  -1/2  Q   1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1/2  m    0  1  1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  m    0  1  1  x
             2    0  1  -1  x    0  1  1  y

p(fm)      6 1    0  1   1  Q
             2    0  1  -1  c    0  1  1  Q
             2    0  1  -1  m    0  1  1  Q
             2    0  1  -1  c    0  1  1  x
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y

p(mgts)    1 1    0  1  1  y

p(fopx)    1 1    0  1  1  f

p(mnopx)   1 1    0  1  1  m

p(odi)     1 1    0  1  1  c
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = {
      val alT = lit(2.0) - comp("Si{4+}")
      Seq(
        "Fe" -> comp("Fe{2+}"),
        "Mg" -> comp("Mg{2+}"),
        "Mn" -> comp("Mn{2+}"),
        "Ca" -> comp("Ca{2+}"),
        "Fe3" -> comp("Fe{3+}"),
        "AlOct" -> (comp("Al{3+}") - alT))
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "m" -> sf("Mn") / 2.0,
      "y" -> sf("AlOct"),
      "f" -> sf("Fe3"),
      "c" -> sf("Ca"),
      "Q" -> order("Q"))
  }

  /** Mixed ilmenite 'ilmm' — order parameter Q (ordered ilmenite)
    * (reference: hpxeos/metapelite/ilmenite_mixed.py). */
  object TcIlmeniteMixed extends Phase {
    val abbreviation = "ilmm"
    val sites = Seq(
      "A" -> Seq("Fe{2+}", "Ti{4+}", "Mg{2+}", "Mn{2+}", "Fe{3+}"),
      "B" -> Seq("Fe{2+}", "Ti{4+}", "Fe{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("oilm", "dilm", "dhem", "geik", "pnt")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_ilmm", 3, Some(2), Nil,
      Seq(
        SiteDef("A", 1.0, Seq("Fe{2+}", "Ti{4+}", "Mg{2+}", "Mn{2+}", "Fe{3+}")),
        SiteDef("B", 1.0, Seq("Fe{2+}", "Ti{4+}", "Fe{3+}"))),
      totalRange = (99.0, 101.0))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt (ilmm block).
    val pBlock = """
p(oilm)    1 1    0  1  1  Q

p(dilm)    1 1    0  4  -1  g   1  i  -1  m  -1  Q

p(dhem)    1 1    1  1  -1  i

p(geik)    1 1    0  1  1  g

p(pnt)     1 1    0  1  1  m
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Mg" -> comp("Mg{2+}"),
      "Mn" -> comp("Mn{2+}"),
      "Fe3" -> comp("Fe{3+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "i" -> (lit(1.0) - sf("Fe3") / 2.0),
      "g" -> sf("Mg"),
      "m" -> sf("Mn"),
      "Q" -> order("Q"))
  }

  /** Spinel 'sp' (reference: hpxeos/metapelite/spinel.py). */
  object TcSpinel extends Phase {
    val abbreviation = "sp"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}"),
      "M2" -> Seq("Al{3+}", "Fe{3+}", "Ti{4+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("herc", "sp", "mt", "usp")
    // Fe2O3 is merged into FeO before APFU + Droop (reference
    // metapelite/spinel.py:_preprocess_oxides -> _calc.fe2o3_to_feo).
    val mineral: MineralSpec = MineralSpec("TC_sp", 4, Some(3),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("M1", 1.0, Seq("Mg{2+}", "Fe{2+}")),
        SiteDef("M2", 2.0, Seq("Al{3+}", "Fe{3+}", "Ti{4+}"))),
      totalRange = (99.0, 101.0),
      preprocess = graft.petro.Convert.fe2o3ToFeo)

    // Verbatim from tc-mp51MnNCKFMASHTO.txt (sp block).
    val pBlock = """
p(herc)  2 1    0  1   1  y
             2   -1  1   1  x    1  1   1  z

p(sp)    1 2    1  1  -1  x    1  1   1  z

p(mt)    1 1    1  2  -1  y -1  z

p(usp)   1 1    0  1   1  z
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Al" -> comp("Al{3+}"),
      "Fe3" -> comp("Fe{3+}"),
      "Ti" -> comp("Ti{4+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = {
      val pool2 = sf("Al") + sf("Fe3") + lit(2.0) * sf("Ti")
      Seq(
        "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
        "y" -> sf("Al") / pool2,
        "z" -> lit(2.0) * sf("Ti") / pool2)
    }
  }

  /** Magnetite 'mt1' — composition-dependent default ordering
    * Q = 2x/(2+x) (reference: hpxeos/metapelite/magnetite.py). */
  object TcMagnetite extends Phase {
    val abbreviation = "mt1"
    val sites = Seq(
      "T" -> Seq("Fe{2+}", "Fe{3+}"),
      "M" -> Seq("Fe{2+}", "Fe{3+}", "Ti{4+}"))
    val endMemberNames = Seq("imt", "dmt", "usp")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_mt1", 4, Some(3),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("T", 1.0, Seq("Mg{2+}", "Fe{2+}", "Mn{2+}")),
        SiteDef("M", 2.0, Seq("Al{3+}", "Fe{3+}", "Ti{4+}", "Cr{3+}"))),
      totalRange = (93.0, 100.5))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt (mt1 block).
    val pBlock = """
p(imt)  1 1    0  2 -2  x  3  Q

p(dmt)  1 1    0  2  3  x -3  Q

p(usp)  1 1    1  1 -1  x
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] =
      Seq("Ti" -> comp("Ti{4+}"))

    override def orderDefault(name: String, sf: String => Column): Column = {
      val x = lit(1.0) - sf("Ti")
      lit(2.0) * x / (lit(2.0) + x)
    }

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> (lit(1.0) - sf("Ti")),
      "Q" -> order("Q"))
  }

  /** Sapphirine 'sa' — order parameter Q
    * (reference: hpxeos/metapelite/sapphirine.py). */
  object TcSapphirine extends Phase {
    val abbreviation = "sa"
    val sites = Seq(
      "M3" -> Seq("Mg{2+}", "Fe{2+}", "Fe{3+}", "Al{3+}"),
      "M456" -> Seq("Mg{2+}", "Fe{2+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("spr4", "spr5", "fspm", "spro", "ospr")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_sa", 20, Some(5),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("M3", 1.0, Seq("Mg{2+}", "Fe{2+}", "Fe{3+}", "Al{3+}")),
        SiteDef("M456", 3.0, Seq("Mg{2+}", "Fe{2+}")),
        SiteDef("T", 1.0, Seq("Si{4+}", "Al{3+}"))),
      totalRange = (99.0, 101.0))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1067-1082.
    val pBlock = """
p(spr4)    1 1    1  4  -1/4  Q  -1  f  -1  x  -1  y

p(spr5)    1 1    0  1  1  y

p(fspm)    3 1    0  2   1  x  -3/4  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  x    0  1  1  y

p(spro)    3 1    0  1   1  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y

p(ospr)    1 1    0  1  1  f
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1099-1117.
    override val sfBlock = """
xMgM3      3 1    1  4  -1  f  -1  x  -1  y  3/4  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y

xFeM3      3 1    0  2   1  x  -3/4  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xFe3M3     1 1    0  1  1  f

xAlM3      1 1    0  1  1  y

xMgM456    1 1    1  2  -1/4  Q  -1  x

xFeM456    1 1    0  2  1/4  Q   1  x

xSiT       1 1    1  2  -1  f  -1  y

xAlT       1 1    0  2   1  f   1  y
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Fe3" -> comp("Fe{3+}"),
      "AlOct" -> (comp("Al{3+}") + comp("Si{4+}") - lit(10.0)))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlOct"),
      "f" -> sf("Fe3"),
      "Q" -> order("Q"))
  }

  /** Ilmenite 'ilm' — older FTO model (no Mg/Mn), order parameter Q
    * (reference: hpxeos/metapelite/ilmenite.py). x defaults to 1 when
    * Fe3+ is absent. */
  object TcIlmenite extends Phase {
    val abbreviation = "ilm"
    val sites = Seq(
      "A" -> Seq("Fe{2+}", "Ti{4+}", "Fe{3+}"),
      "B" -> Seq("Fe{2+}", "Ti{4+}", "Fe{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("oilm", "dilm", "dhem")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_ilm", 3, Some(2),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("A", 1.0, Seq("Fe{2+}", "Mg{2+}", "Mn{2+}", "Fe{3+}")),
        SiteDef("B", 1.0, Seq("Ti{4+}", "Fe{3+}", "Al{3+}", "Cr{3+}"))),
      totalRange = (93.0, 100.5))

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1893-1897.
    val pBlock = """
p(oilm)  1 1    0  1  1  Q

p(dilm)  1 1    0  2  1  x -1  Q

p(dhem)  1 1    1  1 -1  x
"""
    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 1910-1920.
    override val sfBlock = """
xFe2A  1 1    0  2  1/2  x  1/2  Q
xTiA   1 1    0  2  1/2  x -1/2  Q
xFe3A  1 1    1  1 -1  x
xFe2B  1 1    0  2  1/2  x -1/2  Q
xTiB   1 1    0  2  1/2  x  1/2  Q
xFe3B  1 1    1  1 -1  x
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] =
      Seq("Fe3" -> comp("Fe{3+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> (lit(1.0) - sf("Fe3") / 2.0),
      "Q" -> order("Q"))
  }

  /** Plagioclase C-1 'plc' — older single-site ternary feldspar
    * (reference: hpxeos/metapelite/plagioclase_cbar1.py). */
  object TcPlagioclaseCbar1 extends Phase {
    val abbreviation = "plc"
    val sites = Seq("A" -> Seq("Na{+}", "Ca{2+}", "K{+}"))
    val endMemberNames = Seq("abh", "anC", "san")
    val mineral: MineralSpec = TcPl4tr.mineral.copy(name = "TC_plc")

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 284-286.
    val pBlock = """
p(abh)    1 1    1 2 -1 k -1 ca
p(anC)    1 1    0 1  1 ca
p(san)    1 1    0 1  1 k
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xNa" -> comp("Na{+}") / siteTotal("A"),
      "xCa" -> comp("Ca{2+}") / siteTotal("A"),
      "xK" -> comp("K{+}") / siteTotal("A"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "ca" -> sf("xCa"), "k" -> sf("xK"))
  }

  /** K-feldspar C-1 'ksp' — same single-site model, K-friendly
    * parameterisation (reference: hpxeos/metapelite/kfeldspar_cbar1.py). */
  object TcKFeldsparCbar1 extends Phase {
    val abbreviation = "ksp"
    val sites = Seq("A" -> Seq("Na{+}", "Ca{2+}", "K{+}"))
    val endMemberNames = Seq("san", "abh", "anC")
    val mineral: MineralSpec = TcPl4tr.mineral.copy(name = "TC_ksp")

    // Verbatim from tc-mp51MnNCKFMASHTO.txt, lines 347-351.
    val pBlock = """
p(san)     1 1    1  2  -1  ca  -1  na
p(abh)     1 1    0  1  1  na
p(anC)     1 1    0  1  1  ca
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] =
      TcPlagioclaseCbar1.siteFractions(comp, siteTotal)

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "na" -> sf("xNa"), "ca" -> sf("xCa"))
  }

  val phases: Seq[Phase] =
    Seq(TcGarnet, TcBiotite, TcPl4tr, TcK4tr, TcChloritoid, TcStaurolite,
      TcCordierite, TcMuscovite, TcMargarite, TcChlorite, TcEpidote,
      TcOrthopyroxene, TcIlmeniteMixed, TcSpinel, TcMagnetite, TcSapphirine,
      TcIlmenite, TcPlagioclaseCbar1, TcKFeldsparCbar1)
}
