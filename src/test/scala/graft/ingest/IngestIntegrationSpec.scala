package graft.ingest

import org.apache.spark.sql.functions.col
import graft.SparkSpecBase
import graft.model.Entities

/** Closes the S1 → engine loop: paginated client records become a
  * Dataset[String] → spark.read.json with the entity schema → the
  * same DataFrames every downstream operator consumes.
  */
class IngestIntegrationSpec extends SparkSpecBase {
  import GithubClient._

  test("paginate → spark.read.json(issues schema) → queryable entity table") {
    val pages = Map(
      "http://api/issues?per_page=2" -> Response(200,
        Map("Link" -> """<http://api/issues?page=2&per_page=2>; rel="next""""),
        """[
          {"number":1,"state":"open","title":"t1","user":{"login":"alice"}},
          {"number":2,"state":"closed","title":"t2","user":{"login":"bob"},
           "pull_request":{"url":"u"}}
        ]"""),
      "http://api/issues?page=2&per_page=2" -> Response(200, Map.empty,
        """[{"number":3,"state":"open","title":"t3","user":{"login":"alice"}}]"""))
    val transport = new Transport {
      def get(url: String, headers: Map[String, String]): Response =
        pages.getOrElse(url, Response(404))
    }
    val records = paginate(transport, Config(perPage = 2),
      "http://api/issues", "o/r")

    import spark.implicits._
    val df = spark.read.schema(Entities.issue).json(records.toDS())
    assert(df.count() == 3)
    // repo_name stamped on every record by the client
    assert(df.filter(col("repo_name") === "o/r").count() == 3)
    // P1 marker survives the round trip; real issues = 2
    assert(df.filter(col("pull_request").isNull).count() == 2)
    // nested user parses into the declared struct
    assert(df.filter(col("user.login") === "alice").count() == 2)
  }
}
