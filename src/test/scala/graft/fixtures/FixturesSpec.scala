package graft.fixtures

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixturesSpec extends SparkSpec {
  import spark.implicits._

  test("S4: cp949 fruit CSV parses dates and comma-grouped prices, drops BOM line") {
    val df = Fixtures.fruitPrices(spark)
    val n = df.count()
    assert(n > 50)
    assert(df.filter($"price".isNull || $"date".isNull).count() == 0)
    // prices are full numbers (comma strip worked: all > 1000)
    assert(df.filter($"price" < 1000).count() == 0)
    // weekend gap present: fewer rows than calendar days
    val span = df.agg(datediff(max($"date"), min($"date"))).head.getInt(0)
    assert(n < span)
  }

  test("S5/A6/W7: grocery JSON explodes to per-store rows with price ranks") {
    val g = Fixtures.grocery(spark)
    assert(g.count() == 5)
    val stores = g.select($"product", explode($"stores").as("s"))
      .select($"product", $"s.name", $"s.price")
    assert(stores.count() == 15)
    val minMax = stores.groupBy("product")
      .agg(min("price").as("lo"), max("price").as("hi"))
      .filter($"product" === "바나나").head
    assert(minMax.getLong(1) == 350L && minMax.getLong(2) == 420L)
  }

  test("news fixture covers HTML strip, short-content guard, summary exclusion") {
    val n = Fixtures.news(spark)
    assert(n.count() == 5)
    assert(n.filter($"is_summary").count() == 1)
    assert(n.filter(length($"content") <= 50).count() >= 1)
    assert(n.filter($"content".contains("<p>")).count() >= 1)
  }
}
