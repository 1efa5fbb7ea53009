package graft.api

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, DefaultHttp2WindowUpdateFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannel, Http2StreamChannelBootstrap, Http2StreamFrame}

import java.util.concurrent.{CompletableFuture, TimeUnit}

/** Minimal native-gRPC client over Netty's HTTP/2 codec — the measuring
  * and testing counterpart of [[GrpcHttp2Server]] (bench drives warm
  * p50s through it; the spec drives the six-rpc matrix). One connection,
  * one HTTP/2 stream per rpc — the shape of a warm stock client. This is
  * the same netty-codec-http2 engine grpc-java's transport is built on,
  * so round-trips exercise real preface/SETTINGS/HPACK/flow control
  * rather than a loopback through server code. */
final class GrpcHttp2Client(host: String, port: Int,
    tls: Option[javax.net.ssl.SSLContext] = None) {

  private val group = new NioEventLoopGroup(1)
  private val channel: Channel = new Bootstrap()
    .group(group)
    .channel(classOf[NioSocketChannel])
    .remoteAddress(host, port)
    .handler(new ChannelInitializer[io.netty.channel.socket.SocketChannel] {
      override def initChannel(ch: io.netty.channel.socket.SocketChannel): Unit = {
        tls.foreach { ctx =>
          val engine = ctx.createSSLEngine(host, port)
          engine.setUseClientMode(true)
          val params = engine.getSSLParameters
          params.setApplicationProtocols(Array("h2"))
          engine.setSSLParameters(params)
          ch.pipeline().addLast(new io.netty.handler.ssl.SslHandler(engine))
        }
        ch.pipeline().addLast(
          Http2FrameCodecBuilder.forClient().build(),
          new Http2MultiplexHandler(new ChannelInitializer[Http2StreamChannel] {
            override def initChannel(sc: Http2StreamChannel): Unit = () // no server push
          }))
      }
    })
    .connect().syncUninterruptibly().channel()

  /** One unary rpc: returns (message payload with the single 5-byte
    * length prefix stripped and validated, header+trailer map, DATA
    * frame count as delivered). */
  def call(method: String, message: Array[Byte],
      timeoutSec: Long = 30): (Array[Byte], Map[String, String], Int) = {
    val (body, trailerMap, dataFrames) = callRaw(method, message, timeoutSec)
    val payload =
      if (body.isEmpty) Array.emptyByteArray
      else {
        require((body(0) & 0xFF) == 0, "unary reply must be uncompressed")
        val len = java.nio.ByteBuffer.wrap(body, 1, 4).getInt
        require(body.length == 5 + len,
          s"length prefix $len disagrees with body ${body.length - 5}")
        java.util.Arrays.copyOfRange(body, 5, 5 + len)
      }
    (payload, trailerMap, dataFrames)
  }

  /** Like [[call]] but returns the body bytes verbatim (length prefix
    * included, UNvalidated) — for specs that assert on intentionally
    * inconsistent framing, e.g. the pass-2 byte-count guard. */
  def callRaw(method: String, message: Array[Byte],
      timeoutSec: Long = 30): (Array[Byte], Map[String, String], Int) = {
    val headers = new java.util.concurrent.ConcurrentLinkedQueue[Http2HeadersFrame]()
    val data = new java.io.ByteArrayOutputStream()
    var dataFrames = 0
    val done = new CompletableFuture[Unit]()
    val stream = new Http2StreamChannelBootstrap(channel)
      .handler(new SimpleChannelInboundHandler[Http2StreamFrame] {
        override def channelRead0(ctx: ChannelHandlerContext, f: Http2StreamFrame): Unit =
          f match {
            case h: Http2HeadersFrame =>
              headers.add(h)
              if (h.isEndStream) done.complete(())
            case d: Http2DataFrame =>
              val arr = new Array[Byte](d.content().readableBytes())
              d.content().readBytes(arr)
              data.write(arr)
              dataFrames += 1
              // signal flow-control consumption so large streams never stall
              if (d.initialFlowControlledBytes > 0)
                ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(
                  d.initialFlowControlledBytes))
              if (d.isEndStream) done.complete(())
            case _ => ()
          }
        override def exceptionCaught(ctx: ChannelHandlerContext, e: Throwable): Unit =
          done.completeExceptionally(e)
      })
      .open().syncUninterruptibly().getNow
    val hdrs = new DefaultHttp2Headers()
    hdrs.method("POST").scheme("http").authority(s"$host:$port")
      .path(s"/Vector/$method")
    hdrs.set("content-type", "application/grpc")
    hdrs.set("te", "trailers")
    stream.write(new DefaultHttp2HeadersFrame(hdrs))
    stream.writeAndFlush(new DefaultHttp2DataFrame(
      Unpooled.wrappedBuffer(GrpcWeb.messageFrame(message)), true))
    done.get(timeoutSec, TimeUnit.SECONDS)
    val trailerMap = {
      import scala.jdk.CollectionConverters._
      headers.asScala.flatMap { h =>
        h.headers().iterator().asScala.map(e =>
          String.valueOf(e.getKey) -> String.valueOf(e.getValue))
      }.toMap
    }
    (data.toByteArray, trailerMap, dataFrames)
  }

  def close(): Unit = {
    channel.close().syncUninterruptibly()
    group.shutdownGracefully(0, 500, TimeUnit.MILLISECONDS).syncUninterruptibly()
  }
}
