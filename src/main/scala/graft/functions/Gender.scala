package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dictionary-based gender inference — the reference's one custom scalar
  * function `inferirSexo` (reference: src/Command/EtlHisTurnosCommand.php:
  * 359-375; SURVEY OP-29), which wraps a static given-name→gender
  * dictionary with failure→null semantics.
  *
  * Implemented NOT as a Scala UDF but as a map-literal lookup
  * (`element_at` over a `typedLit(Map)`), which stays inside whole-stage
  * codegen and broadcasts the dictionary with the plan — the idiomatic
  * Spark equivalent of the reference's in-process dictionary. Missing
  * names yield null, matching the reference's catch→null behavior.
  *
  * The dictionary covers several hundred common Spanish given names
  * (public knowledge; the reference wraps a public name-dictionary
  * library). Canonical entries carry their standard accents (MARÍA,
  * JOSÉ); an ASCII accent-stripped variant of every accented name is
  * generated from the same list, so both spellings resolve. The DuckDB
  * oracle CASE is generated from the same map — ONE source of truth.
  * The lookup shape is identical at any dictionary size that fits an
  * executor.
  */
object Gender {

  private val maleNames: Seq[String] = Seq(
    "JOSÉ", "JUAN", "CARLOS", "LUIS", "PEDRO", "DIEGO", "MIGUEL",
    "ANTONIO", "FRANCISCO", "MANUEL", "DAVID", "JAVIER", "DANIEL",
    "RAFAEL", "FERNANDO", "JORGE", "ALBERTO", "RICARDO", "EDUARDO",
    "SERGIO", "ANDRÉS", "ROBERTO", "ALEJANDRO", "MARIO", "ÓSCAR",
    "RAÚL", "ENRIQUE", "RAMÓN", "VICENTE", "PABLO", "JESÚS", "ALFREDO",
    "ARTURO", "HÉCTOR", "HUGO", "GUILLERMO", "GERARDO", "GUSTAVO",
    "RODRIGO", "MARTÍN", "MARCOS", "SALVADOR", "FELIPE", "EMILIO",
    "IGNACIO", "JOAQUÍN", "LORENZO", "AGUSTÍN", "ESTEBAN", "CRISTIAN",
    "SEBASTIÁN", "MATÍAS", "NICOLÁS", "SANTIAGO", "TOMÁS", "GABRIEL",
    "SAMUEL", "SIMÓN", "ADRIÁN", "ÁLVARO", "ÁNGEL", "BENJAMÍN",
    "BRUNO", "CÉSAR", "CLAUDIO", "DAMIÁN", "DARÍO", "ELÍAS", "EMANUEL",
    "EZEQUIEL", "FABIÁN", "FACUNDO", "FEDERICO", "FÉLIX", "FRANCO",
    "GASTÓN", "GONZALO", "GREGORIO", "HERNÁN", "HORACIO", "HUMBERTO",
    "ISMAEL", "IVÁN", "JAIME", "JERÓNIMO", "JULIÁN", "JULIO", "LAUTARO",
    "LEANDRO", "LEONARDO", "LISANDRO", "LUCAS", "LUCIANO", "MARCELO",
    "MARIANO", "MAURICIO", "MAXIMILIANO", "MOISÉS", "NELSON", "NÉSTOR",
    "OCTAVIO", "OMAR", "ORLANDO", "OSVALDO", "PATRICIO", "REINALDO",
    "RODOLFO", "ROGELIO", "ROLANDO", "RUBÉN", "SAÚL", "TEODORO",
    "ULISES", "VALENTÍN", "VÍCTOR", "WALTER", "WILFREDO", "XAVIER",
    "ZACARÍAS", "ABEL", "ABRAHAM", "ADÁN", "ADOLFO", "ALAN", "ALDO",
    "ALFONSO", "AMADO", "ANÍBAL", "ARMANDO", "ARNALDO",
    "ATILIO", "AUGUSTO", "AXEL", "BALTASAR", "BARTOLOMÉ", "BAUTISTA",
    "GAEL", "NAHUEL", "THIAGO", "IAN",
    "BENITO", "BERNARDO", "BLAS", "BRAULIO", "CAMILO", "CAYETANO",
    "CECILIO", "CELESTINO", "CIRILO", "CLEMENTE", "CONRADO",
    "CONSTANTINO", "CRISTÓBAL", "DEMETRIO", "DIONISIO", "DOMINGO",
    "DONATO", "EDGAR", "EDGARDO", "EFRAÍN", "ELOY", "ERNESTO",
    "EUGENIO", "EUSEBIO", "EVARISTO", "FAUSTO", "FERMÍN", "FIDEL",
    "FLORENCIO", "FORTUNATO", "GENARO", "GILBERTO", "GINO", "HERIBERTO",
    "HILARIO", "HIPÓLITO", "ISIDRO", "JACINTO", "JACOBO", "JONÁS",
    "JOSUÉ", "LÁZARO", "LEOPOLDO", "LINO", "MARCIAL", "MATEO",
    "MAXIMO", "MEDARDO", "MELCHOR", "NAPOLEÓN", "NARCISO", "NAZARENO",
    "NICANOR", "NORBERTO", "PASCUAL", "PAULINO", "PONCIANO", "PRIMO",
    "PRUDENCIO", "QUINTÍN", "REMIGIO", "RENATO", "RUFINO",
    "SERAFÍN", "SILVIO", "TADEO", "TELMO", "TEÓFILO", "TIMOTEO",
    "TITO", "UBALDO", "URBANO", "VALERIO", "VENANCIO", "VIRGILIO",
    "ZENÓN")

  private val femaleNames: Seq[String] = Seq(
    "MARÍA", "ANA", "LUCÍA", "CARMEN", "ROSA", "SOFÍA", "ISABEL",
    "TERESA", "PILAR", "DOLORES", "JOSEFA", "FRANCISCA", "ANTONIA",
    "MERCEDES", "JUANA", "MANUELA", "RAQUEL", "SARA", "PAULA", "MARTA",
    "ELENA", "SILVIA", "PATRICIA", "LAURA", "CRISTINA", "MÓNICA",
    "ANDREA", "CLAUDIA", "BEATRIZ", "VERÓNICA", "ALICIA", "NORMA",
    "GLORIA", "SUSANA", "GRACIELA", "ADRIANA", "LILIANA", "SANDRA",
    "VIVIANA", "NATALIA", "VALERIA", "CAROLINA", "GABRIELA", "DANIELA",
    "MARIANA", "FLORENCIA", "AGUSTINA", "CAMILA", "VALENTINA",
    "MARTINA", "JULIETA", "VICTORIA", "CATALINA", "ANTONELLA",
    "MICAELA", "ROCÍO", "BELÉN", "MILAGROS", "ESPERANZA",
    "CONSUELO", "AMPARO", "SOLEDAD", "INÉS", "IRENE", "LETICIA",
    "LOURDES", "MAGDALENA", "MARGARITA", "MARISOL", "MIRTA", "NANCY",
    "NÉLIDA", "NOEMÍ", "OLGA", "RAMONA", "REBECA", "RITA", "SABRINA",
    "STELLA", "TAMARA", "ÚRSULA", "VANESA", "VERA", "XIMENA",
    "YOLANDA", "ZULEMA", "ABIGAIL", "AÍDA", "ALBA", "ALEJANDRA",
    "ALMA", "AMALIA", "AMELIA", "ÁNGELA", "ANGÉLICA", "ARACELI",
    "AURORA", "AZUCENA", "BÁRBARA", "BERTA", "BIANCA", "BLANCA",
    "BRENDA", "CANDELARIA", "CELESTE", "CELIA", "CINTIA", "CLARA",
    "CLEMENTINA", "CONSTANZA", "CORINA", "DALIA", "DELIA", "DIANA",
    "DINA", "DORA", "EDITH", "ELBA", "ELIANA", "ELISA", "ELOÍSA",
    "ELSA", "ELVIRA", "EMILIA", "EMMA", "ÉRICA", "ESTELA", "ESTER",
    "EUGENIA", "EVA", "FABIANA", "FÁTIMA", "FERNANDA", "FLAVIA",
    "FLORA", "GEMA", "GENOVEVA", "GEORGINA", "GILDA", "GIMENA",
    "GISELA", "GRISELDA", "HAYDÉE", "HILDA", "HORTENSIA", "IRMA",
    "IVANA", "JACINTA", "JAZMÍN", "JIMENA", "JOHANA", "JOSEFINA",
    "JUDITH", "JULIA", "KARINA", "LARA", "LEILA", "LIDIA", "LILA",
    "LORENA", "LUCIANA", "LUCILA", "LUISA", "LUJÁN", "LUZ", "MABEL",
    "MAITE", "MALVINA", "MARCELA", "MARIBEL", "MARIELA", "MARINA",
    "MARLENE", "MATILDE", "MAYRA", "MELINA", "MELISA", "MÍA", "MILENA",
    "MIRIAM", "MIRANDA", "NADIA", "NOELIA", "NORA", "OFELIA", "OLIVIA",
    "PAMELA", "PAOLA", "PAULINA", "PERLA", "PETRONA", "PIEDAD",
    "PRISCILA", "REGINA", "RENATA", "ROMINA", "ROSALÍA",
    "ROXANA", "RUTH", "SALOMÉ", "SILVANA", "SIMONA", "SONIA",
    "TATIANA", "TERESITA", "VILMA", "VIOLETA", "VIRGINIA", "WANDA",
    "YANINA", "ZOE")

  /** Names that skew male but are given to women often enough that a
    * gender-by-name library reports them as "mostly male" rather than
    * "male" (the reference enum's MostlyMale, EtlHisTurnosCommand.php:
    * 365-367). Public knowledge: ALEXIS/ARIEL/etc. are predominantly
    * male in Spanish-speaking countries but attested for both. */
  private val mostlyMaleNames: Seq[String] = Seq(
    "ALEXIS", "ARIEL", "SANTOS", "NOEL", "DENIS")

  /** The female-skewed counterpart (MostlyFemale): names predominantly
    * female but with an attested male minority (GUADALUPE and ROSARIO
    * are classic Marian devotional names borne by men too). */
  private val mostlyFemaleNames: Seq[String] = Seq(
    "GUADALUPE", "ROSARIO", "AZUL", "NIEVES", "MAR")

  /** Genuinely ambiguous names — no usable skew either way (Unisex). */
  private val unisexNames: Seq[String] = Seq(
    "CRUZ", "TRINIDAD", "REYES", "YAEL", "PAZ")

  private def stripAccentsStr(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")

  /** name (uppercase) → gender label, mirroring the reference library's
    * full enum surface (Male / Female / MostlyMale / MostlyFemale /
    * Unisex, EtlHisTurnosCommand.php:365-367). Accent-stripped ASCII
    * variants are derived from the canonical entries, never listed
    * separately. */
  val dict: Map[String, String] = {
    val canonical =
      maleNames.map(_ -> "Male") ++ femaleNames.map(_ -> "Female") ++
      mostlyMaleNames.map(_ -> "MostlyMale") ++
      mostlyFemaleNames.map(_ -> "MostlyFemale") ++
      unisexNames.map(_ -> "Unisex")
    val ascii = canonical.map { case (n, g) => stripAccentsStr(n) -> g }
    // canonical entries win on (impossible-by-construction) collisions
    (ascii ++ canonical).toMap
  }

  private val dictCol = typedLit(dict)

  /** Infer gender from a first-name column; null when unknown or null. */
  def inferirSexo(firstName: Column): Column =
    element_at(dictCol, upper(firstName))

  /** DuckDB-runnable CASE expression equivalent, for oracle SQL —
    * generated from the SAME map as the Spark lookup. */
  def oracleCase(expr: String): String = {
    val whens = dict.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN upper($expr) = '$k' THEN '$v'" }
      .mkString(" ")
    s"(CASE $whens ELSE NULL END)"
  }
}
