package graft.pipeline

/** Deterministic offline [[Ingest.Fetcher]] producing brewery-shaped rows,
  * including every dirty case the silver layer handles (FIXTURES.md §A1):
  * leading-space country, mixed case + spaces, the 7 mojibake literals,
  * true diacritics, connector punctuation, and nulls. Used by `Main` and
  * the pipeline tests — the real API fetcher is injected in production
  * (no egress here; SURVEY.md §7.4.7).
  */
class SampleFetcher(nRows: Int = 450) extends Ingest.Fetcher {

  /** no-arg ctor for reflective injection (DSv2 `fetcherClass` option). */
  def this() = this(450)

  override def total(): Int = nRows

  private val breweryTypes = Seq("micro", "brewpub", "regional", "large", "planned")

  private val dirtyCities = Seq(
    "Portland", "San Diego", "klagenfurt am w�rthersee", "München",
    "São Paulo", "Rio De Janeiro", "Austin", "some_city")
  private val dirtyStates = Seq(
    "Oregon", "California", "k�rnten", "nieder�sterreich",
    "New York", "Texas", "Wien", "Bayern")
  private val dirtyCountries = Seq(
    " United States", "United States", "Austria", "Germany", "Brazil",
    "Österreich")
  private val dirtyNames = Seq(
    "Anheuser-Busch Inc ̢���� Williamsburg",
    "Café Okei", "Café Okei", "Wimitzbrāu", "Wimitzbr�u",
    "Some â Brewery", "Plain Brewery", "some_brewery")

  override def page(n: Int, perPage: Int): Seq[Map[String, String]] = {
    val start = (n - 1) * perPage
    val end = math.min(start + perPage, nRows)
    (start until end).map { i =>
      val base = Map(
        "id" -> s"brewery-$i",
        "name" -> dirtyNames(i % dirtyNames.size),
        "brewery_type" -> breweryTypes(i % breweryTypes.size),
        "city" -> dirtyCities(i % dirtyCities.size),
        "state" -> dirtyStates(i % dirtyStates.size),
        "country" -> dirtyCountries(i % dirtyCountries.size),
        "longitude" -> (if (i % 7 == 0) null else s"${-122.0 - i % 10 * 0.1}"),
        "latitude" -> (if (i % 7 == 0) null else s"${45.0 + i % 10 * 0.1}"),
        "phone" -> (if (i % 3 == 0) null else s"555-01$i"),
        "website_url" -> (if (i % 5 == 0) null else s"https://example.com/$i"),
        "street" -> (if (i % 4 == 0) null else s"$i Main St"),
        "address_1" -> (if (i % 4 == 0) null else s"$i Main St"),
        "address_2" -> null,
        "address_3" -> null,
        "state_province" -> dirtyStates(i % dirtyStates.size),
        "postal_code" -> f"${97000 + i}%05d")
      base
    }
  }
}
