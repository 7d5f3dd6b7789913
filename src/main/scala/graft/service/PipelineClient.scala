package graft.service

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

/** CLI client for the [[ControlPlane]] — parity with the reference's
  * `pipeline_client.py:13-47`: `--method POST <json_request_file>` posts
  * the file's JSON to the control plane, `--method GET` polls status;
  * either way the response body is printed. The endpoint defaults to the
  * reference's hard-coded `http://localhost:8000/download`
  * (`pipeline_client.py:16,18`) and is overridable via
  * `GRAFT_ENDPOINT` — the one divergence, since tests bind ephemeral
  * ports. Usage: `sbt "runMain graft.service.PipelineClient --method POST req.json"`. */
object PipelineClient {

  private val usage =
    "Usage: runMain graft.service.PipelineClient --method [POST | GET] [json_request_file]"

  def endpoint: String =
    sys.env.getOrElse("GRAFT_ENDPOINT", "http://localhost:8000/download")

  /** Send one request; returns the response body (also printed, like the
    * reference). Separated from `main` so tests can drive it in-process. */
  def send(method: String, requestFile: Option[String], url: String = endpoint): String = {
    val client = HttpClient.newHttpClient()
    val builder = HttpRequest.newBuilder(URI.create(url))
    val req = method match {
      case "POST" =>
        val body = Files.readString(Paths.get(requestFile.getOrElse(
          sys.error("No request file provided for POST request.\n" + usage))))
        builder.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      case _ => builder.GET().build()
    }
    val res = client.send(req, HttpResponse.BodyHandlers.ofString()).body()
    println("Response:\n" + res)
    res
  }

  def main(args: Array[String]): Unit =
    args.toList match {
      case "--method" :: "POST" :: file :: _ => send("POST", Some(file))
      // POST with the file forgotten must be a usage error, not a silent
      // GET status poll the user mistakes for a submitted command
      case "--method" :: "POST" :: Nil =>
        System.err.println("Error: No request file provided for POST request.\n" + usage)
        sys.exit(1)
      case "--method" :: _ :: _ => send("GET", None) // reference: non-POST → GET
      case _ =>
        System.err.println("Error: Not all parameters provided.\n" + usage)
        sys.exit(1)
    }
}
