package graft.eval

import graft.core.FkEdge
import org.apache.spark.sql.SparkSession

/**
 * Deterministic in-memory instances of the REFERENCE'S OWN crawled
 * schemas — taken column-for-column from the schema metadata its
 * trained models persisted (`backend/models/2564b10e49e9651a/
 * metadata.json`: students/enrollments/courses + customers/orders/
 * order_items/items + customer/sales; `backend/models/01fba19f5c891328/
 * metadata.json`: hotels/users/flights), including the crawled FK
 * edges. These exist so the EXTERNAL evaluation set
 * ([[ExternalEval]]) can run the reference team's own published
 * questions verbatim against the schemas those questions were written
 * for, instead of adapting their phrasing to this repo's fixtures
 * (which would contaminate the external-provenance claim).
 *
 * Data is a pure function of the ids (no RNG): reruns, engines and
 * rounds see identical rows. Values are arranged so the reference's
 * published example questions have non-trivial, non-empty answers —
 * e.g. a course titled "X" with Fall-2015 C-grade enrollments below
 * 75 (Report 1 §5), and one student with no enrollments at all.
 */
object ReferenceSchemas {

  val schoolTables: Seq[String] = Seq("students", "enrollments", "courses")
  val storeTables: Seq[String] =
    Seq("customers", "orders", "order_items", "items", "customer", "sales")
  val travelTables: Seq[String] = Seq("hotels", "users", "flights")

  /** FK edges exactly as the reference crawl recorded them
    * (`metadata.json` "relationships"; the travel schema has none). */
  val schoolFks: Seq[FkEdge] = Seq(
    FkEdge("enrollments", "course_id", "courses", "id"),
    FkEdge("enrollments", "student_id", "students", "id"))
  val storeFks: Seq[FkEdge] = Seq(
    FkEdge("orders", "customer_id", "customers", "id"),
    FkEdge("order_items", "item_id", "items", "id"),
    FkEdge("order_items", "order_id", "orders", "id"))
  val travelFks: Seq[FkEdge] = Seq.empty

  private def gradeOf(score: Int): String =
    if (score >= 90) "A" else if (score >= 80) "B" else if (score >= 70) "C"
    else if (score >= 60) "D" else "F"

  /** Register the school schema (students/enrollments/courses). */
  def registerSchool(spark: SparkSession): Seq[String] = {
    import spark.implicits._
    val first = Array("Ada", "Ben", "Cara", "Dev", "Elif", "Finn", "Gao", "Hana", "Ivan", "Jun")
    val last = Array("Adams", "Brown", "Chen", "Diaz", "Evans", "Fox", "Garcia", "Hall")
    val students = (1 to 60).map { i =>
      (i, s"${first(i % 10)} ${last(i % 8)}",
        if (i % 2 == 0) "F" else "M", 18 + i % 6)
    }.toDF("id", "name", "gender", "age")
    // course 8 is literally titled "X": Report 1 §5's example question
    // ("students who took course X in Fall 2015 …") runs verbatim
    val titles = Array("Algebra", "Biology", "Chemistry", "World History",
      "Painting", "Physics", "Literature", "X")
    val courses = (1 to 8).map(c => (c, titles(c - 1), 2014 + c % 3))
      .toDF("id", "title", "year")
    val enrollments = (for {
      s <- 1 to 60
      c <- 1 to 8
      if (s + c) % 3 != 0
      if s != 59 // student 59 has NO enrollments (anti-join questions)
    } yield {
      val score = 45 + ((s * 31 + c * 17) % 56) // 45..100
      (s, c, if ((s + c) % 2 == 0) "Fall" else "Spring",
        2014 + (s * c) % 3, gradeOf(score), score)
    }).toDF("student_id", "course_id", "term", "year", "grade_letter", "numeric_score")
    students.createOrReplaceTempView("students")
    courses.createOrReplaceTempView("courses")
    enrollments.createOrReplaceTempView("enrollments")
    schoolTables
  }

  /** Register the store schema (both crawled store databases:
    * customers/orders/order_items/items and customer/sales). */
  def registerStore(spark: SparkSession): Seq[String] = {
    import spark.implicits._
    val first = Array("Noor", "Omar", "Pia", "Quinn", "Rae", "Sam", "Tess", "Uma")
    val customers = (1 to 40).map { i =>
      (i, s"${first(i % 8)} C$i", if (i % 3 == 0) "F" else "M", 21 + i % 40)
    }.toDF("id", "name", "gender", "age")
    val cats = Array("books", "toys", "grocery", "electronics")
    val items = (1 to 12).map { i =>
      (i, cats(i % 4), BigDecimal(10 + (i * 7) % 90))
    }.toDF("id", "category", "price")
    val orders = (1 to 120).map { o =>
      (o, 1 + o % 40, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(o % 90)),
        BigDecimal(20 + (o * 13) % 200))
    }.toDF("id", "customer_id", "order_date", "total")
    val orderItems = (1 to 120).flatMap { o =>
      Seq((o, 1 + o % 12, 1 + o % 3), (o, 1 + (o * 5) % 12, 1 + (o * 7) % 3))
    }.toDF("order_id", "item_id", "qty")
    val payments = Array("Cash", "Credit Card", "Debit Card")
    val customer = (1 to 30).map { i =>
      (s"C%04d".format(i), if (i % 2 == 0) "Female" else "Male", 19 + i % 45,
        payments(i % 3))
    }.toDF("customerid", "gender", "age", "paymentmethod")
    val malls = Array("Kanyon", "Forum", "Metrocity", "Metropol")
    val sales = (1 to 200).map { i =>
      (s"I%05d".format(i), s"C%04d".format(1 + i % 30), cats(i % 4), 1 + i % 5,
        BigDecimal((5 + (i * 11) % 300).toDouble),
        java.sql.Date.valueOf(java.time.LocalDate.of(2023, 6, 1).plusDays(i % 120)),
        malls(i % 4))
    }.toDF("invoiceno", "customerid", "category", "quantity", "price",
      "invoicedate", "shoppingmall")
    customers.createOrReplaceTempView("customers")
    items.createOrReplaceTempView("items")
    orders.createOrReplaceTempView("orders")
    orderItems.createOrReplaceTempView("order_items")
    customer.createOrReplaceTempView("customer")
    sales.createOrReplaceTempView("sales")
    storeTables
  }

  /** Register the travel schema (hotels/users/flights — the schema the
    * reference's LLM prompt hints at: "fcity" not "fromCity",
    * `app/ai/nl2sql.py:75`). */
  def registerTravel(spark: SparkSession): Seq[String] = {
    import spark.implicits._
    val companies = Array("Acme", "Globex", "Initech", "Umbrella")
    val users = (1 to 20).map { u =>
      (u, companies(u % 4), s"User $u", if (u % 2 == 0) "female" else "male", 22 + u % 30)
    }.toDF("usercode", "company", "name", "gender", "age")
    val cities = Array("Paris", "Rome", "Berlin", "Madrid", "Lisbon")
    val agencies = Array("FlyHigh", "CloudFM", "Rainbow")
    val flights = (1 to 80).map { t =>
      val f = cities(t % 5); val to = cities((t + 1 + t % 3) % 5)
      (t, 1 + t % 20, f, to, if (t % 4 == 0) "firstClass" else "economic",
        BigDecimal(80 + (t * 17) % 400), 1.0 + (t % 7) * 0.5, 300.0 + (t * 23) % 900,
        agencies(t % 3),
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(t % 60)))
    }.toDF("travelcode", "usercode", "fcity", "tcity", "flighttype",
      "fprice", "time", "distance", "agency", "fdate")
    val hotels = (1 to 50).map { t =>
      (t, 1 + t % 20, s"Hotel ${('A' + t % 6).toChar}", cities(t % 5), 1 + t % 9,
        BigDecimal(40 + (t * 19) % 160), BigDecimal((1 + t % 9) * (40 + (t * 19) % 160)),
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(t % 60)))
    }.toDF("travelcode", "usercode", "hname", "place", "days", "hprice", "total", "hdate")
    users.createOrReplaceTempView("users")
    flights.createOrReplaceTempView("flights")
    hotels.createOrReplaceTempView("hotels")
    travelTables
  }
}
